#!/usr/bin/env python
"""Stitch image/image_{n}.png frames into image/output.gif at fps=2 —
behavioral twin of the reference's Phase2/get_gif.py:1-20 (numeric sort on
the frame index, cv2 BGR read preserved)."""

import argparse
import glob
import os

import cv2
import imageio


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images_path", default="image")
    parser.add_argument("--out", default=None, help="default: <images_path>/output.gif")
    parser.add_argument("--fps", type=float, default=2)
    parser.add_argument("--rgb", action="store_true",
                        help="frames are RGB-correct PNGs (rendered with "
                             "Wrapper.py --rgb_frames); default preserves "
                             "the reference's cv2-BGR read so BGR frames "
                             "round-trip to a correct gif")
    args = parser.parse_args()

    imgs = glob.glob(os.path.join(args.images_path, "*.png"))
    imgs = [p for p in imgs if os.path.basename(p).startswith("image_")]
    imgs.sort(key=lambda x: int(os.path.basename(x).split("_")[1].split(".")[0]))
    print(imgs)
    out = args.out or os.path.join(args.images_path, "output.gif")
    with imageio.get_writer(out, mode="I", fps=args.fps) as writer:
        for p in imgs:
            frame = cv2.imread(p)
            if args.rgb:
                # cv2 read BGR-swapped the RGB-correct frame; swap back so
                # imageio (RGB writer) emits true colors
                frame = frame[..., ::-1]
            writer.append_data(frame)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
