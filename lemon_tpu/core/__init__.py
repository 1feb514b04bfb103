from lemon_tpu.core.mesh import get_mesh, local_device_count, shard_batch
from lemon_tpu.core.precision import Precision, default_precision
