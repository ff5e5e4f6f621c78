from csinn2_tpu.utils.logging import debug, error, get_level, info, set_level, warning
from csinn2_tpu.utils.verify import VerifyResult, verify
