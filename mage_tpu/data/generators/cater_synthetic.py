"""Synthetic CATER-GEN stand-in: procedurally rendered scenes with the
reference's action/caption semantics.

The real CATER-GEN datasets are Blender renders distributed as .avi files
(reference README.md:29-37); they cannot be produced in this offline
environment. This module generates *stand-in* scenes that exercise every
downstream CATER component with the same contracts:

- scene metadata in the exact ``scenes/*.json`` schema the caption
  generator consumes (``objects`` with instance/shape/size/color/material/
  locations, ``movements`` with ``[action, target, start, end]`` items —
  reference data/gen_cater_text_anno.py:107-139 field access),
- the four reference actions with visually distinct dynamics: ``_slide``
  (ground-level translation), ``_rotate`` (in-place spin through sprite
  phases), ``_pick_place`` (lift, translate, drop), ``_contain`` (a cone
  lifts, lands on the target object, and occludes it),
- attribute grammar drawn from the CATER-GEN-v2 50-token vocabulary
  (shapes x sizes x colors x materials, snitch always small/gold/metal,
  matching the reference convention),
- 128x128 RGB videos written as real ``videos/*.avi`` (cv2 MJPG) so the
  cv2 ``VideoReader`` -> ``CATER`` dataset -> loader chain runs on actual
  video files, plus a compact device-resident form (sprite bank + integer
  per-frame placements) for resident-data training on the tunneled chip
  (same strategy as device_data.build_compact_*).

Captions are produced by ``cater_text_anno.caption_for_scene`` itself, so
the stand-in grammar is the annotation generator's grammar by
construction.

Usage (disk form):
    python -m mage_tpu.data.generators.cater_synthetic \
        --data-dir ./data/CATER-SYN --num-videos 200
then:
    python -m mage_tpu.data.generators.cater_text_anno \
        --data-dir ./data/CATER-SYN --mode explicit --dataset CATER-GEN-v2
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np

SPRITE = 32  # fixed RGBA sprite canvas (pixels)
IMAGE = 128
MARGIN = 18  # world [-3,3] maps to [MARGIN, IMAGE-MARGIN] pixel centers
N_PHASES = 8  # rotation sprite phases
Z_SCALE = 10.0  # pixels of screen lift per world z unit
T_STORE = 24  # stored frames per video

SHAPES = ["cone", "spl", "sphere", "cylinder", "cube"]
SIZES = {"small": 12, "medium": 16, "large": 20}
COLORS = {
    "gold": (218, 165, 32), "gray": (135, 135, 135), "red": (210, 50, 50),
    "blue": (60, 90, 220), "green": (50, 170, 70), "brown": (140, 95, 45),
    "purple": (150, 70, 200), "cyan": (70, 200, 215), "yellow": (235, 220, 60),
}
MATERIALS = ["rubber", "metal"]
ACTIONS = ["_slide", "_rotate", "_pick_place", "_contain"]


# ---------------------------------------------------------------------------
# Sprite rendering (pure NumPy)
# ---------------------------------------------------------------------------


def _shade(color: np.ndarray, material: str, yy: np.ndarray, xx: np.ndarray,
           half: float) -> np.ndarray:
    """Per-pixel RGB for a shape interior. ``metal`` gets a specular
    diagonal highlight; ``rubber`` a flat, slightly lambertian fill."""
    base = np.broadcast_to(color, (*yy.shape, 3)).astype(np.float64)
    lam = 1.0 - 0.25 * (yy + half) / (2 * half + 1e-9)  # brighter top
    out = base * lam[..., None]
    if material == "metal":
        spec = np.exp(-((xx - yy) ** 2) / (2 * (0.35 * half) ** 2))
        out = out + (255.0 - out) * 0.75 * spec[..., None]
    return out


def draw_sprite(shape: str, size_px: int, color, material: str,
                phase: int = 0) -> np.ndarray:
    """-> (SPRITE, SPRITE, 4) uint8 RGBA, the shape centered and rotated by
    ``phase``/N_PHASES of a half turn (rotation symmetry of the marker)."""
    c = (SPRITE - 1) / 2.0
    yy, xx = np.mgrid[0:SPRITE, 0:SPRITE].astype(np.float64)
    yy -= c
    xx -= c
    ang = 2.0 * np.pi * phase / N_PHASES
    # inverse-rotate coordinates so the drawn shape spins with phase
    ry = np.cos(ang) * yy - np.sin(ang) * xx
    rx = np.sin(ang) * yy + np.cos(ang) * xx
    half = size_px / 2.0
    color = np.asarray(COLORS[color] if isinstance(color, str) else color,
                       np.float64)

    if shape == "sphere":
        mask = ry**2 + rx**2 <= half**2
    elif shape == "cube":
        mask = (np.abs(ry) <= half) & (np.abs(rx) <= half)
    elif shape == "cylinder":
        mask = (np.abs(rx) <= 0.72 * half) & (np.abs(ry) <= half)
    elif shape == "cone":
        # triangle: apex up, base at +half
        t = (ry + half) / (2 * half + 1e-9)
        mask = (ry >= -half) & (ry <= half) & (np.abs(rx) <= t * half)
    elif shape == "spl":  # snitch: small orb with a cross of "wings"
        orb = ry**2 + rx**2 <= (0.55 * half) ** 2
        wings = ((np.abs(rx) <= half) & (np.abs(ry) <= 0.22 * half)) | (
            (np.abs(ry) <= half) & (np.abs(rx) <= 0.22 * half)
        )
        mask = orb | wings
    else:  # pragma: no cover - guarded by SHAPES
        raise ValueError(shape)

    rgb = _shade(color, material, ry, rx, half)
    # orientation marker so rotation is visible on symmetric shapes: a
    # dark radial notch from the center toward the (rotated) +x edge
    notch = (np.abs(ry) <= max(1.5, 0.14 * half)) & (rx >= 0.25 * half) & mask
    rgb[notch] *= 0.35
    out = np.zeros((SPRITE, SPRITE, 4), np.uint8)
    out[..., :3] = np.clip(rgb, 0, 255).astype(np.uint8) * mask[..., None]
    out[..., 3] = mask.astype(np.uint8) * 255
    return out


def floor_background() -> np.ndarray:
    """(IMAGE, IMAGE, 3) uint8: light plane with the 3x3 grid the caption
    coordinates refer to (world cells of size 2 in [-3,3])."""
    img = np.full((IMAGE, IMAGE, 3), 205, np.uint8)
    span = IMAGE - 2 * MARGIN
    for k in range(4):  # grid lines at world x,y in {-3,-1,1,3}
        p = int(round(MARGIN + span * k / 3.0))
        img[p - 1 : p + 1, MARGIN - 1 : IMAGE - MARGIN + 1] = 170
        img[MARGIN - 1 : IMAGE - MARGIN + 1, p - 1 : p + 1] = 170
    return img


def world_to_topleft(x: float, y: float, z: float) -> tuple[int, int]:
    """World (x, y, z) -> integer sprite top-left (row, col). +y is screen
    up (CATER quadrant convention), z lifts the sprite toward the camera."""
    span = IMAGE - 2 * MARGIN
    cx = MARGIN + (x + 3.0) / 6.0 * span
    cy = MARGIN + (3.0 - y) / 6.0 * span - z * Z_SCALE
    top = int(round(cy)) - SPRITE // 2
    left = int(round(cx)) - SPRITE // 2
    top = min(max(top, 0), IMAGE - SPRITE)
    left = min(max(left, 0), IMAGE - SPRITE)
    return top, left


# ---------------------------------------------------------------------------
# Scene sampling
# ---------------------------------------------------------------------------


def _sample_object(rng: np.random.RandomState, shape: str) -> dict:
    if shape == "spl":  # reference convention: the snitch is unique
        return {"shape": "spl", "size": "small", "color": "gold",
                "material": "metal"}
    return {
        "shape": shape,
        "size": list(SIZES)[rng.randint(len(SIZES))],
        "color": list(COLORS)[rng.randint(len(COLORS))],
        "material": MATERIALS[rng.randint(len(MATERIALS))],
    }


def _free_cell(rng, taken: list, min_d: float = 1.7) -> tuple:
    """Rejection-sample a world position at least ``min_d`` from ``taken``,
    relaxing the separation if the plane gets crowded (destinations
    accumulate, so a fixed radius could become infeasible)."""
    d = min_d
    for attempt in range(1000):
        x = rng.uniform(-2.6, 2.6)
        y = rng.uniform(-2.6, 2.6)
        if all((x - tx) ** 2 + (y - ty) ** 2 >= d**2 for tx, ty in taken):
            return x, y
        if attempt % 50 == 49:
            d *= 0.8
    return x, y


def sample_scene(rng: np.random.RandomState, n_objects: int = 4,
                 force_shapes: list | None = None) -> dict:
    """One scene -> {"objects", "movements", "tracks"}.

    ``objects``/``movements`` follow the scenes/*.json schema exactly;
    ``tracks`` is the stand-in's dense per-frame state used by the
    renderer: {instance: {"pos" (T_STORE, 3) float, "phase" (T_STORE,)
    int}}. Two movers perform one action each (the annotation generator
    reads item[0] only, gen_cater_text_anno.py:105); remaining objects are
    static distractors. ``_contain`` requires a cone and targets a
    non-mover. ``force_shapes`` pins the shape list (CATER-GEN-v1 scenes
    are exactly {cone, snitch} so shape-only referents are unambiguous)."""
    if force_shapes is not None:
        n_objects = len(force_shapes)
        shapes = list(force_shapes)
    else:
        shapes = ["cone"] + (["spl"] if rng.randint(2) else [])
        while len(shapes) < n_objects:
            shapes.append(SHAPES[2 + rng.randint(3)])  # sphere/cylinder/cube
    rng.shuffle(shapes)
    objects = []
    taken = []
    for i, shape in enumerate(shapes):
        o = _sample_object(rng, shape)
        o["instance"] = f"{o['shape']}_{i}"
        x, y = _free_cell(rng, taken)
        taken.append((x, y))
        o["start"] = (x, y)
        objects.append(o)

    mover_ids = list(rng.choice(n_objects, size=2, replace=False))
    # containment needs a cone mover and a strictly smaller static target
    # (the landed cone must cover it, the reference's occlusion semantics)
    cone_ids = [i for i in mover_ids if objects[i]["shape"] == "cone"]
    movements = {}
    tracks = {}
    dests = list(taken)
    # action windows complete by T_STORE-2 so every action (including a
    # containing cone's descent) finishes inside the stored video
    windows = [(0, 10 + int(rng.randint(3))),
               (8 + int(rng.randint(4)), 20 + int(rng.randint(3)))]
    for k, i in enumerate(mover_ids):
        o = objects[i]
        choices = ["_slide", "_rotate", "_pick_place"]
        statics = [j for j in range(n_objects) if j not in mover_ids]
        containable = [j for j in statics
                       if SIZES[objects[j]["size"]] < SIZES[o["size"]]]
        if i in cone_ids and containable:
            choices.append("_contain")
        action = choices[rng.randint(len(choices))]
        start, end = windows[k]
        target = None
        x0, y0 = o["start"]
        if action == "_rotate":
            x1, y1 = x0, y0
        elif action == "_contain":
            j = containable[rng.randint(len(containable))]
            target = objects[j]["instance"]
            x1, y1 = objects[j]["start"]
        else:
            x1, y1 = _free_cell(rng, dests)
        dests.append((x1, y1))
        movements[o["instance"]] = [[action, target, int(start), int(end)]]
        tracks[o["instance"]] = _action_track(action, (x0, y0), (x1, y1),
                                              start, end)
        o["end"] = (x1, y1)
    for i in range(n_objects):
        o = objects[i]
        if o["instance"] not in movements:
            movements[o["instance"]] = []
            x0, y0 = o["start"]
            tracks[o["instance"]] = {
                "pos": np.tile([x0, y0, 0.0], (T_STORE, 1)),
                "phase": np.zeros(T_STORE, np.int32),
            }
        tracks[o["instance"]].setdefault(
            "vis", np.ones(T_STORE, np.int32))
        x0, y0 = o["start"]
        x1, y1 = o.get("end", o["start"])
        o["locations"] = {"0": [float(x0), float(y0), 0.0],
                          "1": [float(x1), float(y1), 0.0]}
        o.pop("start"), o.pop("end", None)

    # a contained object is underneath the landed cone: invisible once the
    # cone has (almost) touched down on it
    for name, items in movements.items():
        if items and items[0][0] == "_contain":
            action, target, start, end = items[0]
            t = np.arange(T_STORE)
            u = np.clip((t - start) / max(end - start, 1), 0.0, 1.0)
            tracks[target]["vis"] = (u < 0.95).astype(np.int32)

    # painter's order: statics first, then movers, cones last so a landed
    # cone occludes its contained target (reference semantics: the object
    # is underneath the cone)
    order = ([i for i in range(n_objects) if i not in mover_ids]
             + [i for i in mover_ids if i not in cone_ids] + cone_ids)
    return {"objects": objects, "movements": movements, "tracks": tracks,
            "order": [objects[i]["instance"] for i in order]}


def _action_track(action, p0, p1, start, end):
    x0, y0 = p0
    x1, y1 = p1
    pos = np.zeros((T_STORE, 3))
    phase = np.zeros(T_STORE, np.int32)
    t = np.arange(T_STORE, dtype=np.float64)
    # progress through the action window, clamped outside it
    u = np.clip((t - start) / max(end - start, 1), 0.0, 1.0)
    if action == "_rotate":
        pos[:, 0], pos[:, 1] = x0, y0
        phase[:] = np.floor(u * (2 * N_PHASES - 1e-9)).astype(np.int32) % N_PHASES
    else:
        if action == "_slide":
            m = u  # ground-level translation
            z = np.zeros_like(u)
        else:  # _pick_place / _contain: lift, carry, drop
            lift = np.clip(u / 0.25, 0, 1)
            drop = np.clip((1.0 - u) / 0.25, 0, 1)
            z = 1.4 * np.minimum(lift, drop)
            m = np.clip((u - 0.25) / 0.5, 0, 1)
        pos[:, 0] = x0 + (x1 - x0) * m
        pos[:, 1] = y0 + (y1 - y0) * m
        pos[:, 2] = z
    return {"pos": pos, "phase": phase}


# ---------------------------------------------------------------------------
# Host rendering + compact (device) form
# ---------------------------------------------------------------------------


class SpriteBank:
    """Lazily grown bank of (shape, size, color, material, phase) sprites."""

    def __init__(self):
        self.index: dict[tuple, int] = {}
        self.sprites: list[np.ndarray] = []

    def get(self, shape, size, color, material, phase=0) -> int:
        key = (shape, size, color, material, int(phase))
        if key not in self.index:
            self.index[key] = len(self.sprites)
            self.sprites.append(
                draw_sprite(shape, SIZES[size], color, material, phase)
            )
        return self.index[key]

    def blank(self) -> int:
        """Fully transparent sprite (an invisible — contained — object)."""
        key = ("blank",)
        if key not in self.index:
            self.index[key] = len(self.sprites)
            self.sprites.append(np.zeros((SPRITE, SPRITE, 4), np.uint8))
        return self.index[key]

    def array(self) -> np.ndarray:
        return np.stack(self.sprites) if self.sprites else np.zeros(
            (0, SPRITE, SPRITE, 4), np.uint8
        )


def scene_tables(scene: dict, bank: SpriteBank):
    """-> (sprite_id, top, left) int32 arrays of shape (T_STORE, S) in
    painter's order, the flat per-frame form both renderers consume."""
    S = len(scene["order"])
    sid = np.zeros((T_STORE, S), np.int32)
    top = np.zeros((T_STORE, S), np.int32)
    left = np.zeros((T_STORE, S), np.int32)
    by_name = {o["instance"]: o for o in scene["objects"]}
    for s, name in enumerate(scene["order"]):
        o = by_name[name]
        tr = scene["tracks"][name]
        vis = tr.get("vis", np.ones(T_STORE, np.int32))
        for t in range(T_STORE):
            sid[t, s] = (
                bank.get(o["shape"], o["size"], o["color"], o["material"],
                         int(tr["phase"][t]))
                if vis[t] else bank.blank()
            )
            top[t, s], left[t, s] = world_to_topleft(*tr["pos"][t])
    return sid, top, left


def render_frame(bank_arr: np.ndarray, background: np.ndarray,
                 sid: np.ndarray, top: np.ndarray, left: np.ndarray
                 ) -> np.ndarray:
    """Host compositor: paste sprites in slot order -> (IMAGE, IMAGE, 3)
    uint8. Bit-identical contract with device_data.compose_frames_cater."""
    img = background.copy()
    for s in range(sid.shape[0]):
        spr = bank_arr[sid[s]]
        y, x = int(top[s]), int(left[s])
        patch = img[y : y + SPRITE, x : x + SPRITE]
        a = spr[..., 3:4] > 0
        img[y : y + SPRITE, x : x + SPRITE] = np.where(a, spr[..., :3], patch)
    return img


def render_video(scene: dict, bank: SpriteBank) -> np.ndarray:
    sid, top, left = scene_tables(scene, bank)
    bank_arr = bank.array()
    bg = floor_background()
    return np.stack([
        render_frame(bank_arr, bg, sid[t], top[t], left[t])
        for t in range(T_STORE)
    ])


def build_compact_cater(num_train: int, num_val: int, seed: int = 0,
                        mode: str = "explicit",
                        dataset: str = "CATER-GEN-v2",
                        context_length: int = 38) -> dict:
    """Device-resident form (same strategy as build_compact_*_mnist):
    -> {"bank" (K, 32, 32, 4) uint8, "bank_index" {(shape, size, color,
        material, phase): id}, "background" (128, 128, 3) uint8,
        split: {"sid"/"top"/"left" (M, T_STORE, S) int32,
                "text" (M, context_length) int32, "meta": [scene dicts]}}.

    Captions come from cater_text_anno.caption_for_scene — the annotation
    generator's own grammar (explicit coordinates or ambiguous quadrants +
    attribute subsets). ``dataset="CATER-GEN-v1"`` -> two-object
    {cone, snitch} scenes with the 30-token shape-only vocabulary
    (reference data convention; config/mage_caterv1.yaml vocab_size 30)."""
    import random as pyrandom

    from mage_tpu.data.generators.cater_text_anno import caption_for_scene
    from mage_tpu.data.tokenizers import (CATERV1_VOCAB, CATERV2_VOCAB,
                                          VocabTokenizer)

    v1 = dataset == "CATER-GEN-v1"
    rng = np.random.RandomState(seed)
    cap_rng = pyrandom.Random(seed)
    tok = VocabTokenizer(CATERV1_VOCAB if v1 else CATERV2_VOCAB,
                         split_mode="regex")
    bank = SpriteBank()

    def build_split(num):
        sids, tops, lefts, texts, metas = [], [], [], [], []
        for _ in range(num):
            scene = sample_scene(
                rng, force_shapes=["cone", "spl"] if v1 else None)
            sid, top, left = scene_tables(scene, bank)
            caption = caption_for_scene(scene, mode, dataset, cap_rng)
            sids.append(sid)
            tops.append(top)
            lefts.append(left)
            texts.append(tok.encode_padded(caption, context_length))
            metas.append({"objects": scene["objects"],
                          "movements": scene["movements"],
                          "order": scene["order"],
                          "caption": caption})
        return {
            "sid": np.stack(sids), "top": np.stack(tops),
            "left": np.stack(lefts),
            "text": np.stack(texts).astype(np.int32), "meta": metas,
        }

    train = build_split(num_train)
    val = build_split(num_val)
    return {"bank": bank.array(), "bank_index": dict(bank.index),
            "background": floor_background(), "train": train, "val": val}


# ---------------------------------------------------------------------------
# Disk form: videos/*.avi + scenes/*.json (the real-file chain)
# ---------------------------------------------------------------------------


def write_dataset(data_dir: str, num_videos: int, seed: int = 0,
                  fps: int = 8, dataset: str = "CATER-GEN-v2") -> None:
    import cv2

    os.makedirs(osp.join(data_dir, "scenes"), exist_ok=True)
    os.makedirs(osp.join(data_dir, "videos"), exist_ok=True)
    rng = np.random.RandomState(seed)
    bank = SpriteBank()
    v1 = dataset == "CATER-GEN-v1"
    for i in range(num_videos):
        scene = sample_scene(rng,
                             force_shapes=["cone", "spl"] if v1 else None)
        video = render_video(scene, bank)
        name = f"CATER_new_{i:06d}"
        meta = {"objects": [{k: v for k, v in o.items()}
                            for o in scene["objects"]],
                "movements": scene["movements"]}
        with open(osp.join(data_dir, "scenes", name + ".json"), "w") as fp:
            json.dump(meta, fp)
        path = osp.join(data_dir, "videos", name + ".avi")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                             (IMAGE, IMAGE))
        if not wr.isOpened():  # pragma: no cover - codec fallback
            wr = cv2.VideoWriter(path, 0, fps, (IMAGE, IMAGE))
        for frame in video:
            wr.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        wr.release()
    print(f"wrote {num_videos} synthetic CATER videos to {data_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--num-videos", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", default="CATER-GEN-v2",
                   choices=["CATER-GEN-v1", "CATER-GEN-v2"])
    args = p.parse_args(argv)
    write_dataset(args.data_dir, args.num_videos, args.seed,
                  dataset=args.dataset)


if __name__ == "__main__":
    main()
