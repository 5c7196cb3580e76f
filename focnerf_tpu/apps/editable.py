"""Scene editing CLI: composition + rigid per-object translation.

Parity target: editable.py (reference): the COMBINED flow plus
  - --edit_object / --offset_x/y/z (:76-79): before rendering the edited
    object's field, its ray origins are shifted by the offset
    (modify_rays_for_object :443-471) — i.e. the object is translated
    rigidly inside the composed scene;
  - pose-distance-weighted features (calculate_feats2_inference, :781)
    instead of the plain average;
  - an mp4 of the composited frames (:405-418; moviepy replaced by
    utils/video.py).

The reference resolves which checkpoint is the edited object via a hardcoded
['book','chair','bottle','cup'] list (:500-508) — here the object name comes
from the workspace directory name, so any class works.

Usage:
  python -m focnerf_tpu.apps.editable <scene> --ckpt_dir <dir> \
      --edit_object cup --offset_x 0.2 --workspace edit_ws
"""

from __future__ import annotations

import os

import numpy as np

from focnerf_tpu.config import parse_options


def main(argv=None):
    import jax.numpy as jnp

    opt = parse_options(argv)
    os.makedirs(opt.workspace, exist_ok=True)

    from focnerf_tpu.apps.combined import discover_objects, evaluate_composition

    objs = discover_objects(opt)
    offsets = np.zeros((len(objs), 3), np.float32)
    rotations = np.zeros((len(objs), 3), np.float32)
    if opt.edit_object:
        if opt.edit_object not in objs:
            raise SystemExit(
                f"--edit_object {opt.edit_object!r} not among composed objects {objs}"
            )
        k = objs.index(opt.edit_object)
        offsets[k] = [opt.offset_x, opt.offset_y, opt.offset_z]
        print(f"[editable] translating {opt.edit_object} by {offsets[k]}")
        rotations[k] = [opt.rotate_x, opt.rotate_y, opt.rotate_z]
        if rotations[k].any():
            print(f"[editable] rotating {opt.edit_object} by {rotations[k]} deg")

    # pose-distance-weighted per-view features (calculate_feats2_inference,
    # editable.py:781) — the editing flow's signature feature synthesis
    frames = evaluate_composition(
        opt, offsets=jnp.asarray(offsets), write_video=True,
        feats_mode="pose", rotations=rotations,
    )
    print(f"[editable] rendered {len(frames)} edited frames into {opt.workspace}")


if __name__ == "__main__":
    main()
