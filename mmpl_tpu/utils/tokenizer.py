"""HF tokenizer wrapper with the Wan text-canonicalisation rules.

Re-design of `MMPL_t2v/wan/modules/tokenizers.py` (HuggingfaceTokenizer):
same cleaning modes (whitespace / lower / canonicalize) and max-length
padding returning (ids, mask) as numpy.  `ftfy` is optional in this image;
when absent, its mojibake repair is skipped (html-unescape + strip kept).
"""

from __future__ import annotations

import html
import re
import string
from typing import Optional, Sequence, Union

import numpy as np

try:
    import ftfy
    _HAS_FTFY = True
except ImportError:  # pragma: no cover
    _HAS_FTFY = False


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def canonicalize(text: str,
                 keep_punctuation_exact_string: Optional[str] = None) -> str:
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(str.maketrans("", "", string.punctuation))
            for part in text.split(keep_punctuation_exact_string))
    else:
        text = text.translate(str.maketrans("", "", string.punctuation))
    text = text.lower()
    return re.sub(r"\s+", " ", text).strip()


class HuggingfaceTokenizer:
    def __init__(self, name: str, seq_len: Optional[int] = None,
                 clean: Optional[str] = None, **kwargs):
        assert clean in (None, "whitespace", "lower", "canonicalize")
        from transformers import AutoTokenizer
        self.name = name
        self.seq_len = seq_len
        self.clean = clean
        self.tokenizer = AutoTokenizer.from_pretrained(name, **kwargs)
        self.vocab_size = self.tokenizer.vocab_size

    def _clean(self, text: str) -> str:
        if self.clean == "whitespace":
            return whitespace_clean(basic_clean(text))
        if self.clean == "lower":
            return whitespace_clean(basic_clean(text)).lower()
        if self.clean == "canonicalize":
            return canonicalize(basic_clean(text))
        return text

    def __call__(self, sequence: Union[str, Sequence[str]],
                 return_mask: bool = False, **kwargs):
        kw = {"return_tensors": "np"}
        if self.seq_len is not None:
            kw.update(padding="max_length", truncation=True,
                      max_length=self.seq_len)
        kw.update(kwargs)
        if isinstance(sequence, str):
            sequence = [sequence]
        if self.clean:
            sequence = [self._clean(u) for u in sequence]
        out = self.tokenizer(list(sequence), **kw)
        ids = np.asarray(out["input_ids"], dtype=np.int32)
        if return_mask:
            return ids, np.asarray(out["attention_mask"], dtype=np.int32)
        return ids


class WanTextEncoder:
    """umT5 text-encoding facade (utils/wan_wrapper.py:15-51 equivalent)."""

    def __init__(self, t5_params, t5_cfg: dict, tokenizer_path: str,
                 text_len: int = 512):
        from ..models.t5 import t5_encode
        import jax
        import jax.numpy as jnp
        self.params = t5_params
        self.cfg = dict(t5_cfg)
        self.tokenizer = HuggingfaceTokenizer(
            tokenizer_path, seq_len=text_len, clean="whitespace")
        self._encode = jax.jit(
            lambda p, ids, mask: t5_encode(p, self.cfg, ids, mask))

    def __call__(self, text_prompts: Sequence[str]) -> dict:
        import jax.numpy as jnp
        ids, mask = self.tokenizer(list(text_prompts), return_mask=True,
                                   add_special_tokens=True)
        ctx = self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return {"prompt_embeds": ctx}
