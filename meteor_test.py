"""
Standalone METEOR health check (port of reference meteor_test.py): verifies
the Java METEOR scorer can start and score a trivial pair, or reports why
the -999 fallback will be used.
"""

from coot_videotext_tpu.tasks.caption.metrics.meteor import (
    find_meteor_jar, make_meteor)


def main():
    jar = find_meteor_jar()
    print(f"METEOR jar: {jar}")
    scorer = make_meteor()
    if scorer is None:
        print("METEOR unavailable (no java or no jar); caption eval "
              "will report -999 for METEOR (same crash semantics as the "
              "reference, mart/evaluate_language.py:63).")
        return
    gts = {0: ["this is a cat"]}
    res = {0: ["this is a cat"]}
    score, scores = scorer.compute_score(gts, res)
    print(f"METEOR ok, identity score: {score:.4f}")
    scorer.close()


if __name__ == "__main__":
    main()
