"""
Golden-value tests for the hermetic caption scorers.

The expected numbers are derived BY HAND (n-gram count tables below) from
the published pycocoevalcap algorithms the reference calls
(mart/evaluate_language.py:70-78): BLEU with TINY/SMALL smoothing +
'closest' effective reference length + brevity penalty, ROUGE-L with
beta=1.2 and independent max precision/recall over references, CIDEr-D
with corpus-df idf, count clipping, gaussian length penalty (sigma 6) and
the x10 scale. They were NOT produced by running the code under test.

CIDEr is the caption best-field (trainer_caption best-epoch selection);
these tests pin the semantics a scorer bug would silently corrupt.
"""

from __future__ import annotations

import math
import os
import stat
import sys

import pytest

from coot_videotext_tpu.tasks.caption.metrics.bleu import Bleu
from coot_videotext_tpu.tasks.caption.metrics.cider import Cider
from coot_videotext_tpu.tasks.caption.metrics.rouge import Rouge


# ---------------------------------------------------------------- BLEU

HYP1 = "the cat sat on the mat"            # 6 tokens
REFS1 = ["the cat is on the mat",           # 6 tokens
         "there is a cat on the mat"]       # 7 tokens
# hand counts vs max-clipped refs: guess=[6,5,4,3], correct=[5,3,1,0],
# testlen=6, closest reflen=6 (tie -> equal), ratio ~1 -> no penalty:
#   b1 = 5/6, b2 = (5/6 * 3/5)^(1/2) = sqrt(.5), b3 = (.5*1/4)^(1/3)=.5,
#   b4 = (.125 * TINY/3)^(1/4)
BLEU1_GOLD = [0.8333333330555557, 0.7071067809390603,
              0.49999999981388915, 8.034284186199331e-05]

HYP2 = "the cat"                            # 2 tokens
REFS2 = ["the cat is on the mat"]           # 6 tokens
# guess=[2,1,0,0], correct=[2,1,0,0], ratio=1/3 -> penalty exp(1-3)=e^-2:
#   b1 = b2 = e^-2, b3 = (TINY/SMALL)^(1/3) * e^-2 = .01 e^-2
BLEU2_GOLD = [0.13533528310127763, 0.13533528306744386,
              0.0013533528310127768, 0.00013533528311819452]

# corpus pooling of both samples: totals testlen=8, reflen=12,
# guess=[8,6,4,3], correct=[7,4,1,0], ratio=8/12 -> penalty exp(1-1.5)
BLEU_CORPUS_GOLD = [0.5307143271158761, 0.46324544311531224,
                    0.31925547938151233, 5.064500821076666e-05]


def test_bleu_golden_single_full_overlap_tail():
    corpus, per_n = Bleu(4).compute_score({0: REFS1}, {0: [HYP1]})
    assert corpus == pytest.approx(BLEU1_GOLD, rel=1e-12)
    assert [per_n[k][0] for k in range(4)] == pytest.approx(
        BLEU1_GOLD, rel=1e-12)


def test_bleu_golden_brevity_penalty():
    corpus, _ = Bleu(4).compute_score({0: REFS2}, {0: [HYP2]})
    assert corpus == pytest.approx(BLEU2_GOLD, rel=1e-12)


def test_bleu_golden_corpus_pooling():
    """Corpus BLEU pools count totals BEFORE the ratio (not a mean of
    per-sample scores) — the pycocoevalcap behavior."""
    corpus, per_n = Bleu(4).compute_score(
        {0: REFS1, 1: REFS2}, {0: [HYP1], 1: [HYP2]})
    assert corpus == pytest.approx(BLEU_CORPUS_GOLD, rel=1e-12)
    # per-sample scores unchanged by pooling
    assert per_n[0][0] == pytest.approx(BLEU1_GOLD[0], rel=1e-12)
    assert per_n[0][1] == pytest.approx(BLEU2_GOLD[0], rel=1e-12)


def test_bleu_closest_reflen_tie_breaks_shorter():
    """testlen 5 vs ref lens {4, 6}: both distance 1 -> pycocoevalcap
    takes the SHORTER (min over (dist, len) tuples); ratio 5/4 >= 1 so
    no brevity penalty despite the 6-token ref."""
    hyp = "a b c d e"
    refs = ["a b c d", "a b c d e f"]
    corpus, _ = Bleu(4).compute_score({0: refs}, {0: [hyp]})
    # guess=[5,4,3,2], correct=[5,4,3,2] (prefix of the 6-token ref)
    gold1 = (5 + 1e-15) / (5 + 1e-9)
    assert corpus[0] == pytest.approx(gold1, rel=1e-12)
    assert corpus[3] == pytest.approx(1.0, rel=1e-6)  # no penalty


# -------------------------------------------------------------- ROUGE-L

def test_rouge_golden_multi_ref_max():
    """LCS vs ref1 = 5 ('the cat on the mat'), vs ref2 = 4; pycocoevalcap
    maxes precision and recall independently -> p = r = 5/6 -> F = 5/6."""
    score, scores = Rouge().compute_score({0: REFS1}, {0: [HYP1]})
    assert score == pytest.approx(5.0 / 6.0, rel=1e-12)
    assert scores == pytest.approx([5.0 / 6.0], rel=1e-12)


def test_rouge_golden_beta_weighting():
    """p=0.5, r=1.0, beta=1.2: F = (1+b^2) p r / (r + b^2 p)."""
    score, _ = Rouge().compute_score({0: ["a b"]}, {0: ["a b c d"]})
    assert score == pytest.approx(0.7093023255813954, rel=1e-12)


def test_rouge_zero_overlap():
    score, _ = Rouge().compute_score({0: ["x y z"]}, {0: ["a b c"]})
    assert score == 0.0


# -------------------------------------------------------------- CIDEr-D

def test_cider_single_document_corpus_is_zero():
    """With one video the corpus idf log(N)=0 zeroes every tf-idf vector:
    even a perfect hypothesis scores 0 (known CIDEr property; guards the
    df-from-reference-corpus plumbing)."""
    score, scores = Cider().compute_score(
        {0: ["a b c d e"]}, {0: ["a b c d e"]})
    assert score == 0.0
    assert scores == [0.0]


def test_cider_perfect_disjoint_corpus_is_ten():
    """Two videos with disjoint 5-token refs and perfect hypotheses:
    cosine similarity 1 at every n, no length penalty -> 10.0 each."""
    gts = {0: ["a b c d e"], 1: ["f g h i j"]}
    res = {0: ["a b c d e"], 1: ["f g h i j"]}
    score, scores = Cider().compute_score(gts, res)
    assert score == pytest.approx(10.0, rel=1e-12)
    assert scores == pytest.approx([10.0, 10.0], rel=1e-12)


def test_cider_partial_match_golden():
    """v1: ref 'a b' vs hyp 'a c' -> only the unigram 'a' overlaps; all
    weights equal log(2) (unseen n-grams get full idf), so
    sim_1 = 1/2 and sim_2..4 = 0 -> score 1.25. v2 perfect 2-token ->
    (1+1+0+0)/4*10 = 5.0. Corpus mean 3.125."""
    gts = {0: ["a b"], 1: ["x y"]}
    res = {0: ["a c"], 1: ["x y"]}
    score, scores = Cider().compute_score(gts, res)
    assert scores[0] == pytest.approx(1.25, rel=1e-12)
    assert scores[1] == pytest.approx(5.0, rel=1e-12)
    assert score == pytest.approx(3.125, rel=1e-12)


def test_cider_length_penalty_golden():
    """v1: ref 'a b c d e' vs hyp 'a b c d' (delta=1). Overlaps/norms per
    n: 4/(2*sqrt5), 3/(2*sqrt3), 2/sqrt6, 1/sqrt2; gaussian penalty
    exp(-1/72). Hand value 8.096898391196698; corpus with the perfect
    disjoint v2 (10.0) -> 9.048449195598348."""
    gts = {0: ["a b c d e"], 1: ["f g h i j"]}
    res = {0: ["a b c d"], 1: ["f g h i j"]}
    score, scores = Cider().compute_score(gts, res)
    assert scores[0] == pytest.approx(8.096898391196698, rel=1e-12)
    assert score == pytest.approx(9.048449195598348, rel=1e-12)


# ------------------------------------------------- METEOR driver (stdio)

FAKE_JAVA = r'''#!{python}
import sys
# Minimal stand-in for the METEOR 1.5 jar's -stdio protocol:
#   SCORE ||| ref1 ||| ... ||| hyp   -> one stats line
#   EVAL ||| stats ||| stats ...     -> one score per segment + final
stats_mode = True
for line in sys.stdin:
    line = line.strip()
    if line.startswith("SCORE"):
        parts = line.split(" ||| ")
        hyp, refs = parts[-1], parts[1:-1]
        print(f"{{len(hyp.split())}} "
              f"{{max(len(r.split()) for r in refs)}}")
        sys.stdout.flush()
    elif line.startswith("EVAL"):
        parts = line.split(" ||| ")[1:]
        scores = []
        for st in parts:
            h, r = map(int, st.split())
            scores.append(min(h, r) / max(h, r))
            print(scores[-1])
        print(sum(scores) / len(scores))
        sys.stdout.flush()
'''


@pytest.fixture
def fake_java(tmp_path, monkeypatch):
    """An executable `java` shim on PATH speaking the -stdio protocol, so
    the real subprocess driver (metrics/meteor.py) executes without a
    JVM."""
    shim = tmp_path / "java"
    shim.write_text(FAKE_JAVA.format(python=sys.executable),
                    encoding="utf8")
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    jar = tmp_path / "meteor-1.5.jar"
    jar.write_bytes(b"not a real jar; the shim ignores it")
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}"
                               f"{os.environ.get('PATH', '')}")
    monkeypatch.setenv("METEOR_JAR", str(jar))
    return jar


def test_meteor_driver_protocol(fake_java):
    from coot_videotext_tpu.tasks.caption.metrics.meteor import make_meteor
    met = make_meteor()
    assert met is not None
    try:
        gts = {0: ["the cat is on the mat"], 1: ["a b c"]}
        res = {0: ["the cat"], 1: ["a b c"]}
        final, scores = met.compute_score(gts, res)
        # shim: min(len_h, len_r)/max(...) per segment, mean as final
        assert scores == pytest.approx([2 / 6, 1.0])
        assert final == pytest.approx((2 / 6 + 1.0) / 2)
    finally:
        met.close()


def test_meteor_unavailable_without_java(tmp_path, monkeypatch):
    """No java on PATH -> make_meteor None -> evaluator -999 semantics."""
    from coot_videotext_tpu.tasks.caption.metrics.meteor import make_meteor
    monkeypatch.setenv("PATH", str(tmp_path))  # empty dir: no java
    monkeypatch.delenv("METEOR_JAR", raising=False)
    assert make_meteor() is None
