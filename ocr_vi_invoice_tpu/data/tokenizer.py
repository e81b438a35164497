"""Character tokenizer for CTC recognition.

Framework-neutral (numpy in, numpy out) equivalent of the reference
tokenizer (`/root/reference/model/rec2/tokenizer.py:3-79`): id 0 is the
CTC blank, id 1 is padding, characters start at id 2 in sorted order.
Out-of-vocabulary characters are silently dropped on encode; specials are
skipped on decode.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

from ocr_vi_invoice_tpu.data.vocab import VOCAB

BLANK_ID = 0
PAD_ID = 1


class Tokenizer:
    """Maps characters <-> integer ids with CTC blank/pad specials."""

    blank = "[BLANK]"
    pad = "[PAD]"
    blank_id = BLANK_ID
    pad_id = PAD_ID

    def __init__(self, charset: str = VOCAB):
        self.charset: List[str] = sorted(set(charset))
        self.token_to_id = {self.blank: BLANK_ID, self.pad: PAD_ID}
        for i, ch in enumerate(self.charset):
            self.token_to_id[ch] = i + 2
        self.id_to_token = {i: t for t, i in self.token_to_id.items()}
        self.num_classes = len(self.token_to_id)

    # ------------------------------------------------------------------ #

    def encode(self, texts: Sequence[str], max_len: int | None = None) -> np.ndarray:
        """Encode strings to a (B, L) int32 array, padded with ``PAD_ID``.

        ``max_len`` pins L for static-shape jit paths; otherwise L is the
        batch max (min 1). OOV characters are dropped, matching the
        reference behaviour.
        """
        ids = [
            [self.token_to_id[c] for c in t if c in self.token_to_id] for t in texts
        ]
        if max_len is None:
            max_len = max((len(x) for x in ids), default=1) or 1
        out = np.full((len(ids), max_len), PAD_ID, dtype=np.int32)
        for i, seq in enumerate(ids):
            seq = seq[:max_len]
            out[i, : len(seq)] = seq
        return out

    def lengths(self, texts: Sequence[str]) -> np.ndarray:
        """In-vocab character count per string (CTC target lengths)."""
        return np.array(
            [sum(c in self.token_to_id for c in t) for t in texts], dtype=np.int32
        )

    def decode(self, token_ids: Iterable[Iterable[int]]) -> List[str]:
        """Decode id sequences to strings, skipping blank/pad."""
        token_ids = np.asarray(token_ids) if not isinstance(token_ids, list) else token_ids
        texts = []
        for row in token_ids:
            chars = []
            for i in np.asarray(row).tolist():
                if i in (BLANK_ID, PAD_ID):
                    continue
                tok = self.id_to_token.get(int(i))
                if tok is not None:
                    chars.append(tok)
            texts.append("".join(chars))
        return texts

    def decode_ctc_greedy(self, preds: np.ndarray) -> List[str]:
        """Greedy CTC collapse of an argmax id matrix.

        ``preds``: (B, T) int array of per-frame argmax ids. Collapses
        repeats, drops blanks, then maps to strings — the host half of the
        decode; the argmax itself runs on device.
        """
        preds = np.asarray(preds)
        out = []
        for row in preds:
            prev = -1
            chars = []
            for p in row.tolist():
                if p != BLANK_ID and p != prev:
                    tok = self.id_to_token.get(int(p))
                    if tok is not None and p != PAD_ID:
                        chars.append(tok)
                prev = p
            out.append("".join(chars))
        return out
