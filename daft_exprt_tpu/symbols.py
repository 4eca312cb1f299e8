"""Symbol inventory for Daft-Exprt TPU.

Defines the English symbol set used by the acoustic model: a padding
symbol (index 0 -- zero-padding in collation relies on this), an EOS
marker, word-boundary symbols (whitespace + punctuation) and the stressed
ARPAbet phone set, plus the silence conventions used when ingesting
Montreal-Forced-Aligner TextGrids.

Behavioral parity with the reference symbol table
(/root/reference/src/daft_exprt/symbols.py:16-36): 76 English symbols,
pad at index 0.
"""

import string

# Symbols emitted by MFA in .TextGrid files for silences / unknown words.
MFA_SIL_WORD_SYMBOL = ""
MFA_SIL_PHONE_SYMBOLS = ("", "sp", "sil")
MFA_UNK_WORD_SYMBOL = "<unk>"
MFA_UNK_PHONE_SYMBOL = "spn"

# Canonical silence symbols used in .markers files (collapses MFA's three
# silence spellings into one).
SIL_WORD_SYMBOL = "<sil>"
SIL_PHONE_SYMBOL = "SIL"

# Special tokens.
PAD = "_"
EOS = "~"
WHITESPACE = " "
PUNCTUATION = ",.!?"

# Stressed ARPAbet phone set (69 phones).
ARPABET_STRESSED = [
    "AA0", "AA1", "AA2", "AE0", "AE1", "AE2", "AH0", "AH1", "AH2",
    "AO0", "AO1", "AO2", "AW0", "AW1", "AW2", "AY0", "AY1", "AY2",
    "B", "CH", "D", "DH", "EH0", "EH1", "EH2", "ER0", "ER1", "ER2",
    "EY0", "EY1", "EY2", "F", "G", "HH", "IH0", "IH1", "IH2",
    "IY0", "IY1", "IY2", "JH", "K", "L", "M", "N", "NG",
    "OW0", "OW1", "OW2", "OY0", "OY1", "OY2", "P", "R", "S", "SH",
    "T", "TH", "UH0", "UH1", "UH2", "UW0", "UW1", "UW2",
    "V", "W", "Y", "Z", "ZH",
]

ASCII_LETTERS = string.ascii_uppercase + string.ascii_lowercase

# Full English inventory: [pad, eos, ' ', ',', '.', '!', '?'] + phones.
SYMBOLS_ENGLISH = list(PAD + EOS + WHITESPACE + PUNCTUATION) + ARPABET_STRESSED

# Fast lookup table (symbol -> id).
SYMBOL_TO_ID_ENGLISH = {s: i for i, s in enumerate(SYMBOLS_ENGLISH)}

assert SYMBOLS_ENGLISH[0] == PAD
assert len(SYMBOLS_ENGLISH) == 76
