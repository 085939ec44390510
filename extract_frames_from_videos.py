"""
Extract fixed-FPS center-cropped frames from videos with ffmpeg.

Port of reference extract_frames_from_videos.py:31-623: ffprobe metadata
(cached as json), aspect-preserving scaled center crop, fps resampling,
jpeg quality, multiprocessing pool. Host-side preprocessing tool — requires
the ffmpeg/ffprobe binaries on PATH.
"""

import argparse
import json
import math
import os
import shutil
import subprocess
from concurrent.futures import ProcessPoolExecutor, as_completed
from pathlib import Path
from typing import Tuple, Union

FRAME_FILE = "frame_%010d.jpg"
VIDEO_FORMATS = ("mp4", "mkv", "webm", "avi", "mov")


def systemcall(call: str) -> Tuple[str, str, int]:
    proc = subprocess.run(call, shell=True, capture_output=True,
                          text=True)
    return proc.stdout, proc.stderr, proc.returncode


def get_video_ffprobe_info(file_video: Union[str, Path]) -> dict:
    """ffprobe json metadata (reference :356)."""
    cmd = (f'ffprobe -v quiet -print_format json -show_format '
           f'-show_streams "{file_video}"')
    out, err, code = systemcall(cmd)
    if code != 0:
        raise RuntimeError(f"ffprobe failed for {file_video}: {err}")
    return json.loads(out)


def get_video_info_from_ffprobe_result(info: dict
                                       ) -> Tuple[int, int, float, float]:
    """(width, height, fps, duration) from ffprobe json (reference :380)."""
    streams = [s for s in info["streams"]
               if s.get("codec_type") == "video"]
    assert streams, "no video stream found"
    s = streams[0]
    w, h = int(s["width"]), int(s["height"])
    num, den = s.get("avg_frame_rate", "0/1").split("/")
    fps = float(num) / float(den) if float(den) != 0 else 0.0
    duration = float(info["format"].get("duration", 0))
    return w, h, fps, duration


def rnd(x) -> int:
    return int(round(x))


def get_scaled_crop(h: int, w: int, target_h: int, target_w: int
                    ) -> Tuple[int, int, int, int]:
    """Aspect-preserving center crop rectangle (reference :432)."""
    ratio_in = w / h
    ratio_out = target_w / target_h
    if ratio_in < ratio_out:
        crop_w = w
        crop_h = rnd(w / ratio_out)
    elif ratio_in > ratio_out:
        crop_w = rnd(h * ratio_out)
        crop_h = h
    else:
        crop_w, crop_h = w, h
    crop_x = math.floor((w - crop_w) / 2)
    crop_y = math.floor((h - crop_h) / 2)
    return crop_y, crop_x, crop_h, crop_w


def process_video(vid_id: str, file_video: str, folder_frames: str,
                  ffprobe_info: dict, tw: int, th: int, fps: float,
                  quality: int, verbose: bool = False):
    """Crop+scale+resample one video to jpeg frames (reference :297)."""
    w, h, _fps, duration = get_video_info_from_ffprobe_result(
        ffprobe_info)
    folder_frames = Path(folder_frames)
    shutil.rmtree(str(folder_frames), ignore_errors=True)
    os.makedirs(str(folder_frames))
    crop_y, crop_x, crop_h, crop_w = get_scaled_crop(h, w, th, tw)
    ffmpeg_filter = (f"crop={crop_w:d}:{crop_h:d}:{crop_x:d}:{crop_y:d},"
                     f"scale={tw:d}:{th:d}")
    file_frames = str(folder_frames / FRAME_FILE)
    cmd = (f'ffmpeg -i "{file_video}" -hide_banner -vf '
           f'"{ffmpeg_filter},fps={fps:f}" -qscale:v {quality:d} '
           f'"{file_frames}"')
    if verbose:
        print("command:", cmd)
    out, err, code = systemcall(cmd)
    if code != 0:
        raise RuntimeError(
            f"video processing for {vid_id} failed ({code}):\n{err}")
    num_frames = len(os.listdir(str(folder_frames)))
    return vid_id, code, w, h, _fps, num_frames


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-i", "--input_path", type=str, required=True)
    parser.add_argument("-l", "--input_list", type=str, default=None)
    parser.add_argument("output_path", type=str)
    parser.add_argument("--write", action="store_true",
                        help="Start the crop.")
    parser.add_argument("--fps", type=float, default=16)
    parser.add_argument("--reload", action="store_true",
                        help="reload video info with ffprobe")
    parser.add_argument("-x", "--width", type=int, default=256)
    parser.add_argument("-y", "--height", type=int, default=256)
    parser.add_argument("-q", "--quality", type=int, default=2)
    parser.add_argument("--num_workers", type=int, default=0)
    parser.add_argument("--max_videos", type=int, default=-1)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    input_path = Path(args.input_path)
    if not args.input_list:
        files = sorted(os.listdir(input_path))
    else:
        all_files = set(os.listdir(input_path))
        files = []
        fail = 0
        for name in map(str.strip,
                        Path(args.input_list).read_text(
                            "utf8").splitlines()):
            if not name:
                continue
            if name not in all_files and f"v_{name}" in all_files:
                name = f"v_{name}"
            if name not in all_files:
                print(f"WARN: {name} not found")
                fail += 1
                continue
            files.append(name)
        if fail:
            raise ValueError(f"Missing {fail} videos")
    files = [f for f in files
             if f.rsplit(".", 1)[-1].lower() in VIDEO_FORMATS]
    if args.max_videos > 0:
        files = files[:args.max_videos]

    output_path = Path(args.output_path)
    output_path.mkdir(parents=True, exist_ok=True)
    info_cache = output_path / "ffprobe_info.json"
    infos = (json.loads(info_cache.read_text("utf8"))
             if info_cache.is_file() and not args.reload else {})

    for file in files:
        vid_id = file.rsplit(".", 1)[0]
        if vid_id not in infos:
            infos[vid_id] = get_video_ffprobe_info(input_path / file)
    info_cache.write_text(json.dumps(infos), "utf8")
    print(f"ffprobe info for {len(infos)} videos cached to {info_cache}")

    if not args.write:
        print("Dry run done (pass --write to extract frames).")
        return

    num_workers = args.num_workers or os.cpu_count()
    jobs = []
    with ProcessPoolExecutor(max_workers=num_workers) as pool:
        for file in files:
            vid_id = file.rsplit(".", 1)[0]
            jobs.append(pool.submit(
                process_video, vid_id, str(input_path / file),
                str(output_path / vid_id), infos[vid_id], args.width,
                args.height, args.fps, args.quality, args.verbose))
        for fut in as_completed(jobs):
            vid_id, code, w, h, fps, n = fut.result()
            print(f"{vid_id}: {w}x{h}@{fps:.2f} -> {n} frames")
    print("Done!")


if __name__ == "__main__":
    main()
