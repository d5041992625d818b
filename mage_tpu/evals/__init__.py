from mage_tpu.evals.precision import sen_parse, precision, cross_check
from mage_tpu.evals.metrics import psnr
