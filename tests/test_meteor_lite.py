"""
Golden + property tests for the hermetic METEOR-lite scorer
(tasks/caption/metrics/meteor_lite.py).

Three layers of evidence:
  1. hand-computed formula values (P/R/Fmean/chunk-penalty arithmetic
     done out by hand in the comments);
  2. cross-check vs nltk.translate.meteor_score — an INDEPENDENT
     implementation of the same 2005 algorithm with identical
     parameters (alpha=.9, beta=3, gamma=.5); wordnet is stubbed out so
     nltk runs its exact+stem stages only, same as lite. Equality on
     alignment-unambiguous pairs, score dominance (chunk-minimal vs
     greedy pairing) on 200 random pairs;
  3. the evaluate_language driver path produces a real METEOR number
     (not -999) without a JVM, and COOT_METEOR_LITE=0 restores the
     reference's -999 semantics.
"""

import json

import numpy as np
import pytest

from coot_videotext_tpu.tasks.caption.metrics.meteor_lite import (
    ALPHA, BETA, GAMMA, MeteorLite, _align, sentence_score)


class _NoWordnet:
    """Disables nltk meteor's wordnet stage (no corpus data needed)."""

    @staticmethod
    def synsets(_word):
        return []


def _nltk_score(hyp, ref):
    from nltk.stem.porter import PorterStemmer
    from nltk.translate.meteor_score import single_meteor_score
    return single_meteor_score(ref, hyp, stemmer=PorterStemmer(),
                               wordnet=_NoWordnet())


def _expected(m, ch, nh, nr):
    p, r = m / nh, m / nr
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    return fmean * (1 - GAMMA * (ch / m) ** BETA)


def test_identical_sentence():
    # 6 matches in 1 chunk: P=R=1, Fmean=1, penalty=.5*(1/6)^3
    hyp = "the cat sat on the mat".split()
    s = sentence_score(hyp, hyp)
    assert s == pytest.approx(_expected(6, 1, 6, 6))
    assert s == pytest.approx(1 - 0.5 / 216)


def test_no_overlap_and_empty():
    assert sentence_score("aa bb".split(), "cc dd".split()) == 0.0
    assert sentence_score([], "a".split()) == 0.0
    assert sentence_score("a".split(), []) == 0.0


def test_hand_computed_two_chunks():
    # hyp: "on the mat sat the cat" vs ref "the cat sat on the mat".
    # All 6 words match. Chunk-minimal pairing: [on the mat] -> ref
    # 3,4,5 (one chunk), [sat] -> 2, [the cat] -> 0,1 => 3 chunks.
    hyp = "on the mat sat the cat".split()
    ref = "the cat sat on the mat".split()
    m, ch = _align(hyp, ref)
    assert (m, ch) == (6, 3)
    assert sentence_score(hyp, ref) == pytest.approx(_expected(6, 3, 6, 6))


def test_stem_stage_counts():
    # "running" vs "run": exact stage matches nothing, stem stage does.
    m, ch = _align(["running"], ["run"])
    assert (m, ch) == (1, 1)
    # surplus occurrences stay available to the stem stage: hyp has a
    # surplus exact "run", ref a surplus "running"; they stem-match.
    m2, _ = _align("run run running".split(),
                   "run running running".split())
    assert m2 == 3


def test_subset_precision_recall():
    # hyp "the cat" vs ref "the cat sat on the mat": m=2 (one chunk),
    # P=2/2=1, R=2/6
    s = sentence_score("the cat".split(),
                       "the cat sat on the mat".split())
    assert s == pytest.approx(_expected(2, 1, 2, 6))


def test_matches_nltk_on_unambiguous_pairs():
    cases = [
        ("the president spoke to the audience",
         "the president then spoke to the audience"),
        ("the cat sat on the mat", "the cat was sitting on the mat"),
        ("dogs running quickly", "a dog runs quick"),
        ("chop the onions finely and fry them in butter",
         "finely chop the onion and fry in melted butter"),
    ]
    for h, r in cases:
        ours = sentence_score(h.split(), r.split())
        theirs = _nltk_score(h.split(), r.split())
        assert ours == pytest.approx(theirs, abs=1e-12), (h, r)


def test_dominates_nltk_on_classic_mt_pair():
    # repeated "that"/"the" make the alignment ambiguous; the
    # chunk-minimal pairing beats nltk's greedy one (4 vs 6 chunks at
    # the same 12 matches)
    h = ("it is a guide to action which ensures that the military "
         "always obeys the commands of the party").split()
    r = ("it is a guide to action that ensures that the military "
         "will forever heed party commands").split()
    ours = sentence_score(h, r)
    assert ours == pytest.approx(_expected(12, 4, len(h), len(r)))
    assert ours >= _nltk_score(h, r)


def test_dominates_nltk_greedy_on_random_pairs():
    """Same match cardinality, chunk count <= greedy pairing => lite
    score >= nltk score, always within a small bound above it."""
    rng = np.random.RandomState(0)
    vocab = ("the a cat dog sat runs running on mat rug quickly slow "
             "chops fried onion butter party guide action").split()
    for _ in range(200):
        nh, nr = rng.randint(1, 12), rng.randint(1, 12)
        h = [vocab[k] for k in rng.randint(0, len(vocab), nh)]
        r = [vocab[k] for k in rng.randint(0, len(vocab), nr)]
        ours = sentence_score(h, r)
        theirs = _nltk_score(h, r)
        assert ours >= theirs - 1e-12, (h, r, ours, theirs)


def test_compute_score_interface_and_multi_reference():
    scorer = MeteorLite()
    gts = {0: ["the cat sat on the mat", "a cat is on the mat"],
           1: ["completely different words here"]}
    res = {0: ["the cat sat on the mat"], 1: ["nothing matches this"]}
    final, scores = scorer.compute_score(gts, res)
    assert scores[0] == pytest.approx(1 - 0.5 / 216)  # best reference
    assert scores[1] == 0.0
    assert final == pytest.approx(sum(scores) / 2)
    assert scorer.method() == "METEOR"
    scorer.close()


def test_evaluate_language_real_meteor_without_jvm(tmp_path,
                                                  monkeypatch):
    """End-to-end driver path: with no java/jar, METEOR comes from
    METEOR-lite (a real number), and COOT_METEOR_LITE=0 restores the
    reference's -999 crash semantics."""
    from coot_videotext_tpu.tasks.caption import evaluate_language as el
    monkeypatch.setattr(el, "make_meteor", lambda: None)

    sub = {"results": {
        "v_a": [{"sentence": "the cat sat on the mat", "timestamp": 0}],
        "v_b": [{"sentence": "chop the onions", "timestamp": 0}]}}
    gt = {"v_a": "the cat sat on the mat.",
          "v_b": "chop the onions finely."}
    sub_f = tmp_path / "sub.json"
    gt_f = tmp_path / "gt.json"
    sub_f.write_text(json.dumps(sub), encoding="utf8")
    gt_f.write_text(json.dumps(gt), encoding="utf8")

    scores = el.evaluate_language_files(sub_f, [gt_f], verbose=False,
                                        all_scorer=True)
    assert scores["METEOR"] > 0.3
    assert scores["Bleu_4"] >= 0.0  # rest of the grid intact

    monkeypatch.setenv("COOT_METEOR_LITE", "0")
    scores_ref = el.evaluate_language_files(sub_f, [gt_f],
                                            verbose=False,
                                            all_scorer=True)
    assert scores_ref["METEOR"] == -999
