from mage_tpu.utils.timer import Timer
from mage_tpu.utils.metrics import MetricsWriter
