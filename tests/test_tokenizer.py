"""Tokenizer parity vs the reference SimpleTokenizer plus golden encodings.

The reference tokenizer is imported through the shim (identical ftfy stub on
both sides, so text cleaning matches). Golden ids are additionally hardcoded
so this test keeps working if the reference mount ever disappears.
"""

import numpy as np
import pytest

from reference_shim import install_reference

x_clip = install_reference()
from x_clip.tokenizer import tokenizer as ref_tokenizer  # noqa: E402

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

GOLDEN = {
    "a photo of a cat": [320, 1125, 539, 320, 2368],
}


def test_vocab_size():
    assert tok.vocab_size == 49408 == ref_tokenizer.vocab_size


def test_special_token_ids():
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


@pytest.mark.parametrize("text", SAMPLES)
def test_encode_parity(text):
    assert tok.encode(text) == ref_tokenizer.encode(text)


def test_golden_encodings():
    for text, ids in GOLDEN.items():
        assert tok.encode(text) == ids


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
