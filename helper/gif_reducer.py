"""Trim a GIF to its first half and double its playback speed.

Script port of the reference's helper/gif_reducer.py (same transform:
keep the first half of the frames, halve the per-frame duration), with a
CLI instead of hard-coded paths.

Usage:
    python helper/gif_reducer.py input.gif [output.gif] [--keep FRACTION] [--speed FACTOR]
"""
from __future__ import annotations

import sys


def reduce_gif(input_path, output_path=None, keep=0.5, speed=2.0):
    from PIL import Image, ImageSequence

    output_path = output_path or input_path.rsplit(".", 1)[0] + "_reduced.gif"
    gif = Image.open(input_path)
    frames = [f.copy() for f in ImageSequence.Iterator(gif)]
    duration = gif.info.get("duration", 50)

    frames = frames[: max(1, int(len(frames) * keep))]
    new_duration = max(int(duration / speed), 1)
    frames[0].save(
        output_path, save_all=True, append_images=frames[1:], loop=0,
        duration=new_duration, disposal=2,
    )
    print(f"[gif_reducer] {input_path} -> {output_path} "
          f"({len(frames)} frames @ {new_duration} ms)")
    return output_path


if __name__ == "__main__":
    args = sys.argv[1:]
    keep = 0.5
    speed = 2.0
    if "--keep" in args:
        i = args.index("--keep")
        keep = float(args[i + 1])
        del args[i : i + 2]
    if "--speed" in args:
        i = args.index("--speed")
        speed = float(args[i + 1])
        del args[i : i + 2]
    if not args:
        sys.exit("usage: gif_reducer.py input.gif [output.gif] "
                 "[--keep F] [--speed S]")
    reduce_gif(args[0], args[1] if len(args) > 1 else None, keep, speed)
