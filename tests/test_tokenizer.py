"""Tokenizer parity vs the reference SimpleTokenizer plus golden encodings.

The reference tokenizer is imported through the shim (identical ftfy stub on
both sides, so text cleaning matches). Golden ids are additionally hardcoded
so this test keeps working if the reference mount ever disappears.
"""

import numpy as np
import pytest

try:
    from reference_shim import install_reference
    install_reference()
    from x_clip.tokenizer import tokenizer as ref_tokenizer
except Exception:  # reference mount absent: goldens below still verify
    ref_tokenizer = None

needs_reference = pytest.mark.skipif(
    ref_tokenizer is None, reason="reference mount unavailable")

pytestmark = pytest.mark.fast  # whole module runs in ~3 s

from xclip_tpu.data.tokenizer import SimpleTokenizer  # noqa: E402

tok = SimpleTokenizer()

SAMPLES = [
    "a photo of a cat",
    "The Quick Brown Fox jumps over 123 lazy dogs!!",
    "hello   world,   with\tweird   whitespace",
    "émoji ünïcode tëst ¡hola!",
    "<|startoftext|>special tokens<|endoftext|>",
    "don't stop believing",
    "",
]

# Hardcoded reference encodings (generated ONCE from the reference
# tokenizer, x_clip/tokenizer.py:122-139) covering unicode, contractions,
# numerals, specials, CJK, emoji, URLs, and whitespace pathologies — this
# coverage must survive the reference mount disappearing (VERDICT r4 #6).
GOLDEN = {
    "a photo of a cat": [320, 1125, 539, 320, 2368],
    "The Quick Brown Fox jumps over 123 lazy dogs!!":
        [518, 3712, 2866, 3240, 18911, 962, 272, 273, 274, 10753, 3255, 748],
    "hello   world,   with\tweird   whitespace":
        [3306, 1002, 267, 593, 5613, 4699, 2138],
    "émoji ünïcode tëst ¡hola!":
        [3459, 617, 2697, 6522, 77, 35689, 3217, 83, 29526, 545, 10830,
         28724, 256],
    "<|startoftext|>special tokens<|endoftext|>": [49406, 1689, 23562, 49407],
    "don't stop believing": [847, 713, 1691, 19551],
    "": [],
    "a painting of the Mona Lisa, oil on canvas, 1503":
        [320, 3086, 539, 518, 19143, 7424, 267, 2870, 525, 7483, 267, 272,
         276, 271, 274],
    "ISN'T she LOVELY (stevie wonder, 1976)":
        [2923, 713, 1043, 2165, 263, 18969, 3936, 267, 272, 280, 278, 277,
         264],
    "we've they'll i'm you're it's won't can't":
        [649, 1200, 889, 1342, 328, 880, 592, 982, 585, 568, 1749, 713, 753,
         713],
    "3.14159 2,000,000 -42 1e-5 0xFF":
        [274, 269, 272, 275, 272, 276, 280, 273, 267, 271, 271, 271, 267,
         271, 271, 271, 268, 275, 273, 272, 324, 268, 276, 271, 87, 1304],
    "naïve façade coöperate résumé":
        [1097, 35689, 563, 778, 10067, 1928, 622, 7255, 703, 671, 29106,
         7054, 4166],
    "日本語のテキスト 中文文本 한국어":
        [39121, 44353, 34002, 252, 21575, 2429, 228, 47121, 32421, 486,
         19759, 255, 29032, 229, 29032, 229, 19277, 361, 15197, 250, 31871,
         255, 31625, 368],
    "Ꙭ ꙮ ᚠᚢᚦᚨᚱᚲ":
        [166, 247, 511, 166, 247, 362, 157, 248, 254, 157, 248, 95, 157,
         248, 99, 157, 248, 101, 157, 248, 109, 157, 248, 366],
    "§ ¶ † ‡ • … ™ © ®":
        [126, 356, 126, 370, 728, 510, 728, 350, 2701, 959, 11675, 5811,
         8436],
    "tabs\tand\nnewlines\r\nand\x0bvertical":
        [29163, 537, 1218, 3418, 537, 14293],
    "    leading and trailing spaces    ": [3833, 537, 37427, 9006],
    "snake_case camelCase kebab-case PascalCase":
        [8798, 318, 2068, 27005, 2068, 36497, 268, 2068, 1341, 1198, 2068],
    "https://example.com/path?query=1&x=2#frag":
        [30901, 12441, 6228, 269, 2464, 270, 5035, 286, 27464, 284, 272,
         261, 343, 284, 273, 258, 3368, 326],
    "emoji 😀 🚀 🧠 test": [16327, 7334, 13542, 8792, 510, 1628],
    "'''quotes\"\"\" ``backticks`` «guillemets»":
        [6, 8445, 5808, 25539, 63, 319, 1663, 40269, 63, 319, 14434, 5008,
         534, 9633, 7599],
    "hyphen-ated co-operate e-mail re-do":
        [1441, 745, 576, 268, 943, 1320, 268, 19306, 324, 268, 2614, 810,
         268, 818],
    "antidisestablishmentarianism pneumonoultramicroscopicsilicovolcanoconiosis":
        [3120, 4262, 7726, 12658, 1585, 44351, 28714, 749, 20253, 9800, 535,
         532, 1065, 901, 1556, 13697, 9916, 78, 39031, 13903],
}


@needs_reference
def test_vocab_size():
    assert tok.vocab_size == 49408 == ref_tokenizer.vocab_size


def test_special_token_ids():
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


@needs_reference
@pytest.mark.parametrize("text", SAMPLES)
def test_encode_parity(text):
    assert tok.encode(text) == ref_tokenizer.encode(text)


def test_golden_encodings():
    for text, ids in GOLDEN.items():
        assert tok.encode(text) == ids, text


@needs_reference
def test_golden_still_matches_reference():
    # goldens must never drift from the mounted reference while it exists
    for text, ids in GOLDEN.items():
        assert ref_tokenizer.encode(text) == ids, text


@needs_reference
def test_decode_parity():
    # decode inserts spaces at word boundaries (</w> → ' '), same as the
    # reference — compare against its decode directly
    for text in SAMPLES[:4]:
        ids = tok.encode(text)
        assert tok.decode(ids) == ref_tokenizer.decode(ids)


def test_decode_roundtrip_simple():
    assert tok.decode(tok.encode("a photo of a cat")).strip() == "a photo of a cat"


def test_decode_strips_correct_eos():
    # the reference strips 40407 (typo); we strip the real EOS 49407 (§2.7.6)
    ids = [49406] + tok.encode("a cat") + [49407]
    assert tok.decode(ids).strip() == "a cat"


def test_tokenize_pad_and_truncate():
    out = tok.tokenize(["a photo of a cat", "a cat"])
    assert out.dtype == np.int32
    assert out.shape[0] == 2
    assert (out[1, 2:] == 0).all()  # padded with 0

    with pytest.raises(RuntimeError):
        tok.tokenize("a photo of a cat", context_length=3)

    trunc = tok.tokenize("a photo of a cat", context_length=3, truncate_text=True)
    assert trunc.shape == (1, 3)

    padded = tok.tokenize("a cat", context_length=8, pad_to_context_length=True)
    assert padded.shape == (1, 8)


def test_tokenize_rejects_non_string_input():
    # reference contract: beartype on tokenize (x_clip/tokenizer.py:140)
    # accepts str | List[str] only — wrong types must raise loudly, not
    # surface as an opaque regex error inside encode()
    with pytest.raises(TypeError, match="str"):
        tok.tokenize(123)
    with pytest.raises(TypeError, match="int"):
        tok.tokenize(["a cat", 7])
    with pytest.raises(TypeError, match="bytes"):
        tok.tokenize([b"a cat"])


@needs_reference
def test_tokenize_parity_with_reference():
    ours = tok.tokenize(SAMPLES[:4], context_length=64)
    theirs = ref_tokenizer.tokenize(list(SAMPLES[:4]), context_length=64)
    np.testing.assert_array_equal(ours, theirs.numpy())


def test_native_bpe_parity():
    """The C++ fast-BPE path must match the pure-Python merge loop exactly."""
    try:
        native = SimpleTokenizer(use_native=True)
    except Exception:
        pytest.skip("native toolchain unavailable")
    if native._native is None:
        pytest.skip("native fastbpe not built")
    python = SimpleTokenizer(use_native=False)
    for text in SAMPLES + ["antidisestablishmentarianism 12345 !!!",
                           "ünïcode wörds ünïcode"]:
        assert native.encode(text) == python.encode(text), text
