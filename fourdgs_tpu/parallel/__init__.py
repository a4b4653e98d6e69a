from fourdgs_tpu.parallel.mesh import make_mesh
from fourdgs_tpu.parallel.sharded import sharded_train_step
