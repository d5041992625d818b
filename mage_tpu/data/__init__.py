from mage_tpu.data.recordio import RecordReader, RecordWriter
from mage_tpu.data.readers import open_blob_store
from mage_tpu.data.tokenizers import VocabTokenizer, MNIST_VOCAB, CATERV1_VOCAB, CATERV2_VOCAB
from mage_tpu.data.loader import Loader
