from csinn2_tpu.parallel.mesh import make_mesh
from csinn2_tpu.parallel.tp import local_config, shard_llama_params, tp_llama_forward
