from fourdgs_tpu.ops import transforms, sh, losses, schedule, knn
