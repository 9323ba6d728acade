"""Stitch dynamic/static segmentation renders side by side (analogue of
the reference's merge_dynamic_static tool, reference:
opencood/tools/merge_dynamic_static.py)."""
from __future__ import annotations

import os


def merge_dynamic_static(dynamic_dir: str, static_dir: str, out_dir: str):
    import cv2
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    names = sorted(
        set(os.listdir(dynamic_dir)) & set(os.listdir(static_dir))
    )
    for name in names:
        d = cv2.imread(os.path.join(dynamic_dir, name))
        s = cv2.imread(os.path.join(static_dir, name))
        if d is None or s is None:
            continue
        if d.shape != s.shape:
            s = cv2.resize(s, (d.shape[1], d.shape[0]))
        cv2.imwrite(os.path.join(out_dir, name),
                    np.concatenate([d, s], axis=1))
    return len(names)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dynamic_dir", required=True)
    p.add_argument("--static_dir", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    n = merge_dynamic_static(a.dynamic_dir, a.static_dir, a.out_dir)
    print(f"merged {n} frames -> {a.out_dir}")
