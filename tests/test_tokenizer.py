"""CLIP BPE tokenizer tests with a synthetic vocab (merge order, </w>
end-of-word handling, special tokens, padding/truncation)."""

import json

import pytest

from diffusionhandles_tpu.models.tokenizer import (CLIPBPETokenizer,
                                                   HashTokenizer)


@pytest.fixture()
def tok(tmp_path):
    # byte-level symbols for ascii letters map to themselves
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "!": 2}
    idx = 3
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch] = idx
        idx += 1
    # word pieces
    for piece in ["a</w>", "t</w>", "at</w>", "c", "ca", "cat</w>", "ta",
                  "hat</w>", "h", "ha"]:
        vocab[piece] = idx
        idx += 1
    merges = ["a t</w>", "c a", "ca t</w>", "h a", "ha t</w>", "t a"]
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(merges))
    return CLIPBPETokenizer(str(vp), str(mp), max_length=8)


def test_bpe_merges(tok):
    # 'cat' -> c a t</w> -> (a t</w>) has rank 0 -> c + at</w>? No:
    # merges apply by rank: 'a t</w>' rank 0 merges first -> c, at</w>;
    # then 'c a' can't apply. So tokens are ['c', 'at</w>'].
    ids = tok.tokenize("cat")
    names = {v: k for k, v in tok.encoder.items()}
    assert [names[i] for i in ids] == ["c", "at</w>"]


def test_special_tokens_and_padding(tok):
    out = tok(["cat hat"])[0]
    assert out[0] == tok.bos_token_id
    assert tok.eos_token_id in out
    assert len(out) == 8
    # padded with '!' (id 2), SD-2 convention
    assert out[-1] == tok.pad_token_id == 2


def test_truncation(tok):
    out = tok(["cat " * 50])[0]
    assert len(out) == 8
    assert out[-1] == tok.eos_token_id  # eos forced at the end


def test_lowercase_and_whitespace(tok):
    assert tok.tokenize("  CAT  ") == tok.tokenize("cat")


def test_hash_tokenizer_deterministic():
    t = HashTokenizer(vocab_size=128, max_length=10)
    a = t(["hello world"])[0]
    b = t(["hello world"])[0]
    assert a == b
    assert len(a) == 10
    assert all(0 <= i < 128 for i in a)
    assert t(["hello there"])[0] != a
