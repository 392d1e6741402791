"""Tokenizer surface tests (reference tokenizers.py HuggingfaceTokenizer
+ data_utils.py:130-165 special tokens)."""

import numpy as np
import pytest

from univid_tpu.utils.tokenizers import (HashTokenizer, HFTokenizerWrapper,
                                         QWEN2_SPECIAL_TOKENS,
                                         load_tokenizer)


def test_hash_tokenizer_deterministic_and_roundtrip():
    t1, t2 = HashTokenizer(), HashTokenizer()
    ids = t1.encode("a red ball bouncing")
    assert ids == t2.encode("a red ball bouncing")  # cross-instance
    assert all(i >= t1.reserved for i in ids)       # reserved ids unused
    assert t1.decode(ids) == "a red ball bouncing"  # seen-word roundtrip
    # unseen ids decode to placeholders, never crash
    assert t2.decode([999999 % t2.vocab_size]).startswith("<tok")


def test_hash_tokenizer_padded_batch_contract():
    tok = HashTokenizer()
    ids, lens = tok.batch_encode_padded(["one two three", ""], seq_len=8)
    assert len(ids) == 2 and all(len(r) == 8 for r in ids)
    assert lens[0] == 3 and lens[1] == 1  # empty clamps to 1
    assert ids[0][3:] == [0] * 5          # zero padding


class _FakeHF:
    """Minimal transformers-tokenizer stand-in for the wrapper contract."""

    def encode(self, text, add_special_tokens=False):
        assert add_special_tokens is False
        return [len(w) for w in text.split(" ")]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join("x" * i for i in ids)


def test_hf_wrapper_whitespace_clean_and_pad():
    w = HFTokenizerWrapper(_FakeHF(), seq_len=6)
    # whitespace cleaning collapses runs (reference HuggingfaceTokenizer
    # canonicalize whitespace behavior)
    assert w.encode("a   red\n\tball") == w.encode("a red ball")
    ids, lens = w.batch_encode_padded(["aa bbb c"])
    assert ids[0] == [2, 3, 1, 0, 0, 0] and lens[0] == 3
    # truncation at seq_len
    ids, lens = w.batch_encode_padded(["a a a a a a a a a"])
    assert len(ids[0]) == 6 and lens[0] == 6


def test_qwen2_special_tokens_pin():
    # data_utils.py:130-165 id assignments the BAGEL checkpoints assume
    assert QWEN2_SPECIAL_TOKENS == {
        "bos_token_id": 151644, "eos_token_id": 151645,
        "start_of_image": 151652, "end_of_image": 151653}


def test_load_tokenizer_offline_error_is_clear():
    with pytest.raises(RuntimeError, match="unavailable offline"):
        load_tokenizer("/nonexistent/tokenizer/dir")
