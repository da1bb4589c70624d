"""Fragment checkpoints: stage-boundary dump/reload (ful.hpp made real).

The reference ships fragment serialization (dims + dot histograms + zero +
per-frame number/position/RLE payloads, ful.hpp:11-102) but never calls
it; here it is a working resume point between pipeline stages.  Format:
one ``.npz`` per fragment (dots, zero, frame numbers/positions) plus the
frames' packed nibble payloads, all under ``<dir>/<tag>/``.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import List

import numpy as np

from remap_tpu.pipeline.state import Fragment, FrameRef, FrameStore


def _savez_fast(path: str, **arrays) -> None:
    """npz-compatible writer at deflate level 1.

    ``np.savez_compressed`` pins zlib's default level (6): a 100k-frame
    session store (~7 GB of packed nibbles + medians) took 150-250 s to
    compress on this harness's single core — which silently dominated
    the "fgs"/"arf" stage walls of the 100k contract (the saves sit
    between the stage callbacks).  Level 1 deflates the same payload
    ~3-4x faster within a few percent of the ratio; ``np.load`` reads
    any deflate level, so the on-disk format is unchanged."""
    with zipfile.ZipFile(
        path, "w", compression=zipfile.ZIP_DEFLATED, compresslevel=1,
        allowZip64=True,
    ) as zf:
        for name, arr in arrays.items():
            with zf.open(name + ".npy", "w", force_zip64=True) as f:
                np.lib.format.write_array(
                    f, np.ascontiguousarray(arr), allow_pickle=False
                )


def save(
    directory: str,
    tag: str,
    fragments: List[Fragment],
    include_store: bool = True,
) -> None:
    """``include_store=False`` skips the frame-store payload: a resume
    from this tag then reconstructs fragments with ``store=None``.  The
    builder uses it for the ``filtered`` checkpoint — the only stage
    past it (arf clean) reads nothing but the dot canvases, and the
    store is a multi-GB second compression of bytes the ``collect``
    checkpoint already holds."""
    root = os.path.join(directory, tag)
    os.makedirs(root, exist_ok=True)
    meta = {"count": len(fragments)}
    store = fragments[0].store if fragments else None
    if store is not None and include_store:
        meta["height"] = store.height
        meta["width"] = store.width
        payload = dict(
            numbers=np.array(sorted(store._images.keys()), np.int64),
            images=np.stack(
                [store._images[k] for k in sorted(store._images.keys())]
            ),
        )
        if store.has_medians:
            payload["medians"] = np.stack(
                [store._medians[k] for k in sorted(store._medians.keys())]
            )
        _savez_fast(os.path.join(root, "store.npz"), **payload)
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump(meta, f)
    for i, frag in enumerate(fragments):
        _savez_fast(
            os.path.join(root, f"fragment{i}.npz"),
            dots=frag.dots,
            zero=np.array(frag.zero, np.int64),
            numbers=np.array([r.number for r in frag.frames], np.int64),
            positions=np.array(
                [r.position for r in frag.frames], np.int64
            ).reshape(-1, 2),
        )


def load(directory: str, tag: str) -> List[Fragment]:
    root = os.path.join(directory, tag)
    with open(os.path.join(root, "meta.json")) as f:
        meta = json.load(f)
    store = None
    store_path = os.path.join(root, "store.npz")
    if os.path.exists(store_path):
        store = FrameStore(meta["height"], meta["width"])
        data = np.load(store_path)
        # materialize each array ONCE: NpzFile re-decompresses the whole
        # member on every __getitem__, so indexing data["images"][k]
        # inside the loop is O(frames x store-bytes) — a 100k-frame
        # session checkpoint (3.5 GB packed) never finished loading
        numbers = data["numbers"]
        images = data["images"]
        medians = data["medians"] if "medians" in data else None
        for k, num in enumerate(numbers):
            store._images[int(num)] = images[k]
            if medians is not None:
                store._medians[int(num)] = medians[k]
    fragments = []
    for i in range(meta["count"]):
        data = np.load(os.path.join(root, f"fragment{i}.npz"))
        fragments.append(
            Fragment(
                dots=data["dots"],
                zero=tuple(int(v) for v in data["zero"]),
                frames=[
                    FrameRef(int(n), (int(p[0]), int(p[1])))
                    for n, p in zip(data["numbers"], data["positions"])
                ],
                store=store,
            )
        )
    return fragments
