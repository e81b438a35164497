import numpy as np

from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer, BLANK_ID, PAD_ID
from ocr_vi_invoice_tpu.data.vocab import VOCAB


def test_vocab_size():
    # Reference charset is 230 unique characters -> 232 classes with specials
    # (/root/reference/model/rec2/vocab.py, tokenizer.py)
    assert len(VOCAB) == 230
    assert VOCAB == "".join(sorted(set(VOCAB)))


def test_tokenizer_ids():
    tok = Tokenizer()
    assert tok.num_classes == 232
    assert tok.blank_id == BLANK_ID == 0
    assert tok.pad_id == PAD_ID == 1
    # Characters are assigned ids 2.. in sorted order
    assert tok.token_to_id[sorted(set(VOCAB))[0]] == 2


def test_encode_decode_roundtrip():
    tok = Tokenizer()
    texts = ["Hóa đơn GTGT", "123.456₫", "xin chào"]
    ids = tok.encode(texts)
    assert ids.dtype == np.int32
    decoded = tok.decode(ids)
    assert decoded == texts


def test_encode_drops_oov_and_pads():
    tok = Tokenizer()
    ids = tok.encode(["a§b", "xyz"])  # § is OOV
    assert tok.decode(ids) == ["ab", "xyz"]
    assert ids.shape == (2, 3)
    assert ids[0, 2] == PAD_ID


def test_encode_static_max_len():
    tok = Tokenizer()
    ids = tok.encode(["abc"], max_len=8)
    assert ids.shape == (1, 8)
    assert (ids[0, 3:] == PAD_ID).all()


def test_ctc_greedy_collapse():
    tok = Tokenizer()
    a = tok.token_to_id["a"]
    b = tok.token_to_id["b"]
    preds = np.array([[a, a, BLANK_ID, a, b, b, BLANK_ID, PAD_ID]])
    assert tok.decode_ctc_greedy(preds) == ["aab"]


def test_lengths_counts_in_vocab_only():
    tok = Tokenizer()
    assert tok.lengths(["a§b", ""]).tolist() == [2, 0]
