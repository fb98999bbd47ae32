"""Real-asset validation harness (scripts/validate_real_assets.py).

The external assets (OpenAI CLIP checkpoints, the BPE vocab gz,
torchvision video weights) are network-blocked in CI — those checks skip
unless the files exist.  The merge-loop fixture below always runs: it
drives the REAL-vocab code path (bpe_ranks populated) with a tiny
synthetic merge table whose BPE result is derived by hand, so the merge
loop is tested against clip/simple_tokenizer.py:62-132 semantics without
the 1.3 MB asset.
"""

import gzip
import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "validate_real_assets",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "validate_real_assets.py"))
vra = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(vra)


def _make_vocab_gz(tmp_path, merges):
    path = str(tmp_path / "vocab.txt.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: test\n")
        f.write("\n".join(merges))
    return path


def test_merge_loop_against_hand_derived_bpe(tmp_path):
    """Fixture derivation ('aaab', merges [('a','a'), ('aa','a')]):

    word = (a, a, a, b</w>); rank-0 merge (a,a) applies left-to-right
    once per scan → (aa, a, b</w>); rank-1 (aa,a) → (aaa, b</w>); no
    further pair is ranked.  Vocab ids: 256 base bytes, 256 byte+'</w>'
    (so 'b</w>' = 256 + index('b') = 256+65 = 321), then merges in file
    order ('aa' = 512, 'aaa' = 513), then SOT=514 / EOT=515.
    """
    from llmmil_tpu.data.tokenizer import ClipTokenizer
    tok = ClipTokenizer(bpe_path=_make_vocab_gz(tmp_path,
                                                ["a a", "aa a"]))
    assert tok.bpe_ranks == {("a", "a"): 0, ("aa", "a"): 1}
    assert tok.encoder["aa"] == 512 and tok.encoder["aaa"] == 513
    assert tok.sot == 514 and tok.eot == 515
    assert tok.encode("aaab") == [513, 321]
    # no applicable merge: plain byte + </w> ids
    assert tok.encode("ab") == [64, 321]
    # merge must NOT cross the word-boundary marker: 'aaba' ends in
    # 'a</w>' (= 256+64 = 320), not 'a', so (aa,a) can't fire on the tail
    assert tok.encode("aaba") == [512, 65, 320]


def test_merge_applies_left_to_right_within_scan(tmp_path):
    """One scan of the best-ranked bigram merges EVERY occurrence
    left-to-right (the `while i < len(word)` inner loop): 'aaaa' with
    only ('a','a') ranked → (aa, aa) → stops (aa,aa unranked)."""
    from llmmil_tpu.data.tokenizer import ClipTokenizer
    tok = ClipTokenizer(bpe_path=_make_vocab_gz(tmp_path, ["a a"]))
    # 'aaaa' → (a,a,a,a</w>): merge pass → (aa, a, a</w>); (aa,a)/(a,a</w>)
    # unranked → stop.  ids: aa=512, a=64, a</w>=320
    assert tok.encode("aaaa") == [512, 64, 320]


_CLIP_CKPT = os.path.expanduser("~/.cache/clip/ViT-B-32.pt")
_BPE_GZ = os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz")


@pytest.mark.skipif(not os.path.exists(_CLIP_CKPT),
                    reason="real CLIP checkpoint not present")
def test_real_clip_checkpoint_converts():
    vra.check_clip_ckpt(_CLIP_CKPT)


@pytest.mark.skipif(not os.path.exists(_BPE_GZ),
                    reason="real BPE vocab not present")
def test_real_bpe_vocab_tokenizes_canonically():
    vra.check_bpe_vocab(_BPE_GZ)


def test_harness_reports_skips_cleanly(tmp_path, capsys):
    """With no assets, every check skips and the harness exits clean."""
    res = vra.main(["--clip_ckpt", str(tmp_path / "absent.pt"),
                    "--bpe_vocab", str(tmp_path / "absent.gz")])
    assert set(res.values()) == {vra.SKIP}
