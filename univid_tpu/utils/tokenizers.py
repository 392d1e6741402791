"""Tokenizer loading with a hermetic offline fallback.

The reference wraps HF tokenizers (models/wan/utils/modules/tokenizers.py
HuggingfaceTokenizer for UMT5; Qwen2Tokenizer + data_utils
add_special_tokens:130-165 for BAGEL). This environment has no network
egress, so `load_tokenizer` resolves only local paths/caches; tests and
offline smoke runs use `HashTokenizer` — a deterministic word-hash
tokenizer exposing the same encode/decode surface (a stand-in, clearly
NOT vocabulary-compatible with real checkpoints).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional


# Special token ids appended by the reference (data_utils.py:130-165 adds
# <|im_start|>, <|im_end|>, <|vision_start|>, <|vision_end|> to Qwen2).
QWEN2_SPECIAL_TOKENS = {
    "bos_token_id": 151644,   # <|im_start|>
    "eos_token_id": 151645,   # <|im_end|>
    "start_of_image": 151652,
    "end_of_image": 151653,
}


def load_tokenizer(path_or_name: str, *, seq_len: Optional[int] = None,
                   clean: str = "whitespace"):
    """Try transformers AutoTokenizer from a local path; raise with a clear
    message when offline and not cached."""
    try:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(path_or_name,
                                            local_files_only=True)
        return HFTokenizerWrapper(tok, seq_len=seq_len, clean=clean)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"tokenizer '{path_or_name}' unavailable offline ({e}); pass a "
            "local checkpoint directory or use HashTokenizer for smoke "
            "tests") from e


class HFTokenizerWrapper:
    """Thin wrapper matching the reference HuggingfaceTokenizer surface
    (whitespace cleaning, optional pad/truncate to seq_len)."""

    def __init__(self, tokenizer, seq_len: Optional[int] = None,
                 clean: str = "whitespace"):
        self.tokenizer = tokenizer
        self.seq_len = seq_len
        self.clean = clean

    def _clean(self, text: str) -> str:
        if self.clean == "whitespace":
            return re.sub(r"\s+", " ", text).strip()
        return text

    def encode(self, text: str) -> List[int]:
        return self.tokenizer.encode(self._clean(text),
                                     add_special_tokens=False)

    def decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=True)

    def batch_encode_padded(self, texts: List[str]):
        """(ids [B, seq_len] int32 list-of-lists, lens [B]) for the UMT5
        contract."""
        out_ids, lens = [], []
        for t in texts:
            ids = self.encode(t)
            if self.seq_len is not None:
                ids = ids[: self.seq_len]
            lens.append(len(ids))
            if self.seq_len is not None:
                ids = ids + [0] * (self.seq_len - len(ids))
            out_ids.append(ids)
        return out_ids, lens


@dataclass
class HashTokenizer:
    """Deterministic offline tokenizer: word -> stable hash bucket.

    decode() is lossy (returns token placeholders) except for ids seen
    during this process's encode calls, which round-trip exactly.
    """

    vocab_size: int = 151000
    reserved: int = 256  # low ids reserved (never produced by hashing)
    _seen: Dict[int, str] = field(default_factory=dict)

    def encode(self, text: str) -> List[int]:
        ids = []
        for word in re.findall(r"\S+", text):
            h = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
            tid = self.reserved + h % (self.vocab_size - self.reserved)
            self._seen[tid] = word
            ids.append(tid)
        return ids

    def decode(self, ids: List[int]) -> str:
        return " ".join(self._seen.get(i, f"<tok{i}>") for i in ids)

    def batch_encode_padded(self, texts: List[str], seq_len: int = 512):
        out_ids, lens = [], []
        for t in texts:
            ids = self.encode(t)[:seq_len]
            lens.append(max(len(ids), 1))
            out_ids.append(ids + [0] * (seq_len - len(ids)))
        return out_ids, lens
