from ocr_vi_invoice_tpu.data.vocab import VOCAB  # noqa: F401
from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer, BLANK_ID, PAD_ID  # noqa: F401
