"""Vietnamese OCR character set.

Charset parity matters: CTC class ids must be identical to the reference
(`/root/reference/model/rec2/vocab.py:1-21`) or decoded strings and ported
checkpoints diverge. The reference builds its vocabulary from Vietnamese
vowels with diacritics (both cases), consonants (both cases), digits,
currency symbols and ASCII punctuation, then sorts the de-duplicated set.
We reproduce the same construction (same constituent sets, same
sort-of-set-union) so `VOCAB` is byte-identical, yielding 230 characters
and 232 CTC classes once the two specials are added by the tokenizer.
"""

# Lowercase Vietnamese vowels with all tone marks.
_VOWELS = (
    "aáàảãạăắằẳẵặâấầẩẫậ"
    "eéèẻẽẹêếềểễệ"
    "iíìỉĩị"
    "oóòỏõọôốồổỗộơớờởỡợ"
    "uúùủũụưứừửữự"
    "yýỳỷỹỵ"
)

# Consonants, including f/j/w/z which appear in loanwords and codes.
_CONSONANTS = "bcdđghklmnpqrstvxfjwz"

_DIGITS = "0123456789"

# USD and Vietnamese đồng currency marks.
_CURRENCY = "$₫"

# ASCII punctuation and the space character.
_SYMBOLS = "!\"#%&'()*+,-./:;<=>?@[\\]^_`{|}~ "

_ALL = (
    _VOWELS
    + _VOWELS.upper()
    + _CONSONANTS
    + _CONSONANTS.upper()
    + _DIGITS
    + _CURRENCY
    + _SYMBOLS
)

#: The full character set as a sorted, de-duplicated string (230 chars).
VOCAB = "".join(sorted(set(_ALL)))
