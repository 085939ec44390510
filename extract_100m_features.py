"""
Extract S3D HowTo100M video features on TPU.

Port of reference extract_100m_features.py:54-162 around the flax S3D
backbone (coot_videotext_tpu/models/s3d.py): frames at 16 FPS / 256x256
-> sliding windows of --kernel 32 frames with --stride 16 -> 512-d
video_embedding per window -> h5. Loads the released torch checkpoint
`pretrained_models/s3d_howto100m.pth` via the weight converter; the jitted
NDHWC forward runs on the TPU (the reference notes its space-to-depth stem
was a TPU trick — here it actually runs on one).
"""

import argparse
import os
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np


class FramesLoader:
    """Read frame_%010d.jpg dirs (reference :14)."""

    def __init__(self, input_path) -> None:
        from PIL import Image  # noqa: F401  (validated lazily)
        print(f"Checking {input_path} for frames")
        num_frames = {}
        for frame_dir in sorted(os.listdir(input_path)):
            full = Path(input_path) / frame_dir
            if not full.is_dir():
                continue
            num_frames[frame_dir] = sum(
                1 for f in os.listdir(full) if f.endswith(".jpg"))
        print(f"Found {len(num_frames)} videos with "
              f"{sum(num_frames.values())} frames total")
        self.input_path = input_path
        self.num_frames = num_frames

    def get_frames(self, video_id: str) -> np.ndarray:
        """All frames, float32 [0,1], shape (T, H, W, 3) (NDHWC)."""
        from PIL import Image
        frames = []
        for n in range(self.num_frames[video_id]):
            file = (Path(self.input_path) / video_id /
                    f"frame_{n + 1:010d}.jpg")
            arr = np.array(Image.open(str(file)))
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            frames.append(arr)
        return np.stack(frames).astype(np.float32) / 255.0


def main():
    from coot_videotext_tpu.models.s3d import S3D, load_torch_s3d_weights

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("frames_path", type=str)
    parser.add_argument("output_file", type=str)
    parser.add_argument("--checkpoint", type=str,
                        default="pretrained_models/s3d_howto100m.pth")
    parser.add_argument("--kernel", type=int, default=32)
    parser.add_argument("--stride", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--layer", type=str, default="video_embedding",
                        help="'video_embedding', 'mixed_5c' or a comma "
                             "separated combination")
    parser.add_argument("--bf16", action="store_true",
                        help="run the backbone in bfloat16")
    args = parser.parse_args()

    kernel, stride = args.kernel, args.stride
    output_names = args.layer.split(",")

    print("Load model...")
    model = S3D(num_classes=512,
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    sample = jnp.zeros((1, kernel, 256, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    if Path(args.checkpoint).is_file():
        import torch
        sd = torch.load(args.checkpoint, map_location="cpu")
        params = load_torch_s3d_weights(params, sd)
        print(f"Loaded weights from {args.checkpoint}")
    else:
        print(f"WARNING: checkpoint {args.checkpoint} not found, "
              f"running with random weights (feature smoke test only).")
    params = jax.device_put(params)

    @jax.jit
    def forward(params, frames):
        out = model.apply({"params": params}, frames)
        return jnp.concatenate(
            [out[name].astype(jnp.float32) for name in output_names],
            axis=-1)

    frames_loader = FramesLoader(args.frames_path)
    vid_h5_file = Path(args.output_file)
    os.makedirs(vid_h5_file.parent, exist_ok=True)
    vid_h5 = h5py.File(vid_h5_file, "a")

    for key in frames_loader.num_frames:
        if key in vid_h5:
            continue
        num_frames = frames_loader.num_frames[key]
        frames = frames_loader.get_frames(key)  # (T, H, W, 3)

        windows = []
        for pointer in range(0, num_frames, stride):
            single = frames[pointer:pointer + kernel]
            if single.shape[0] < kernel:
                if num_frames > kernel:
                    single = frames[-kernel:]
                else:
                    single = None
            if single is not None:
                windows.append(single)
        if not windows:
            print(f"WARNING: Low amount of data for {key}, only "
                  f"{num_frames} frames.")
            short = frames[:16]
            if short.shape[0] < 16:
                # repeat the last frame up to the 16-frame minimum the
                # backbone's space-to-depth needs (the reference slices
                # frames[:, :16] and crashes on shorter videos,
                # reference extract_100m_features.py:147-150)
                pad = np.repeat(short[-1:], 16 - short.shape[0], axis=0)
                short = np.concatenate([short, pad], axis=0)
            windows = [short]

        results = []
        for start in range(0, len(windows), args.batch_size):
            batch = np.stack(windows[start:start + args.batch_size])
            results.append(np.asarray(jax.device_get(
                forward(params, jnp.asarray(batch)))))
        result = np.concatenate(results, axis=0)
        vid_h5[key] = result
        print(f"{key}: {result.shape}")

    vid_h5.close()
    print("Done!")


if __name__ == "__main__":
    main()
