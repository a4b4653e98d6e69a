from fourdgs_tpu.models.gaussians import GaussianParams, create_from_points
from fourdgs_tpu.models.deformation import DeformConfig, init_deform, deform_apply
