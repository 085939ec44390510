"""
Regenerate the yc2-scale synthetic retrieval dataset under data/yc2like/.

A deterministic (seed=0) 1/6-scale YouCook2 "2d3d" lookalike: 192 train /
48 val videos, ~7.7 clips+sentences per video, 4096-d video features at
1 fps, 1536-d text features, paired via a shared per-clip latent so
retrieval is learnable. Produced by the same generator the tests use
(coot_videotext_tpu/data/synthetic.py generate_retrieval_dataset); the
output is byte-stable for a given seed, so the files are NOT tracked in
git (data/yc2like is gitignored) — run this script to materialize them
for the reference-vs-TPU A/B (PARITY.md) or any yc2like experiment.

Usage: python data_gen_yc2like.py
"""

from pathlib import Path

from coot_videotext_tpu.data.synthetic import generate_retrieval_dataset


def main() -> None:
    overrides = generate_retrieval_dataset(
        Path(__file__).resolve().parent / "data",
        dataset_name="yc2like",
        vid_feat_name="video_feat_2d3d",
        text_feat_name="text_feat_yc2like",
        num_videos=192, num_val_videos=48,
        vid_feat_dim=4096, text_feat_dim=1536,
        mean_clips=7.7, max_clips=16,
        fps=1.0, mean_duration_sec=320.0,
        tokens_per_sentence=18, seed=0)
    print("generated data/yc2like; dataset config overrides:")
    print(overrides)


if __name__ == "__main__":
    main()
