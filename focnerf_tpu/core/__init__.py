from focnerf_tpu.core.camera import nerf_matrix_to_ngp, rand_poses, OrbitCamera
from focnerf_tpu.core.rays import get_rays, sample_ray_indices
from focnerf_tpu.core.geometry import (
    near_far_from_aabb,
    sph_from_ray,
    morton3d,
    morton3d_invert,
)
