from focnerf_tpu.ops.activation import trunc_exp
from focnerf_tpu.ops.sh import sh_encode
from focnerf_tpu.ops.freq import freq_encode
from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_init, hashgrid_encode
from focnerf_tpu.ops.composite import composite_weights, composite_rays
