from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params, density_fn, color_fn, field_fn
