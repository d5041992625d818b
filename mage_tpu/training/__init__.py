from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.training.lr import epoch_lr
