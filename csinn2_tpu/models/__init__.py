from csinn2_tpu.models.common import NetBuilder, QuantRecorder
from csinn2_tpu.models.dfsmn_asr import DFSMNASR, DFSMNConfig
from csinn2_tpu.models.mobilenet import MobileNetV1, MobileNetV2, MobileNetV3
from csinn2_tpu.models.resnet import ResNet50
