"""Convert image collections into training zips with dataset.json labels.

Counterpart of the reference dataset_tool (edm/dataset_tool.py:57-440):
sources — image folder, zip, CIFAR-10 python archive, MNIST idx files —
converted to a zip of PNGs + dataset.json {"labels": [[name, label], ...]},
with optional resize/crop transforms (center-crop / center-crop-wide).

Usage:
  python dataset_tool.py --source=cifar-10-python.tar.gz --dest=cifar10.zip
  python dataset_tool.py --source=images_dir --dest=data.zip --resolution=64x64
"""
from __future__ import annotations

import argparse
import gzip
import io
import json
import os
import pickle
import tarfile
import zipfile

import numpy as np


def _iter_folder(path):
    exts = {".png", ".jpg", ".jpeg"}
    names = sorted(
        os.path.relpath(os.path.join(r, f), path)
        for r, _, fs in os.walk(path) for f in fs
        if os.path.splitext(f)[1].lower() in exts
    )
    from PIL import Image

    # label from top-level subdirectory name, if any (dataset_tool.py:111-126)
    dirs = sorted({n.split(os.sep)[0] for n in names if os.sep in n})
    label_map = {d: i for i, d in enumerate(dirs)}
    for n in names:
        img = np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
        label = label_map.get(n.split(os.sep)[0]) if os.sep in n else None
        yield img, label


def _iter_zip(path):
    from PIL import Image

    with zipfile.ZipFile(path) as zf:
        names = sorted(zf.namelist())
        labels = {}
        if "dataset.json" in names:
            with zf.open("dataset.json") as f:
                meta = json.load(f).get("labels") or []
            labels = dict(meta)
        for n in names:
            if os.path.splitext(n)[1].lower() not in (".png", ".jpg", ".jpeg"):
                continue
            with zf.open(n) as f:
                img = np.asarray(Image.open(f).convert("RGB"))
            yield img, labels.get(n)


def _iter_lmdb(path):
    """LMDB image database (edm/dataset_tool.py:113-139): values are encoded
    image bytes; cv2 decode (BGR->RGB) with PIL fallback, unlabeled."""
    import io as _io

    from diffusion_tts_tpu.utils.lmdb_io import iterate_lmdb

    for _key, value in iterate_lmdb(path):
        img = None
        try:
            import cv2

            img = cv2.imdecode(np.frombuffer(value, dtype=np.uint8), 1)
            if img is not None:
                img = img[:, :, ::-1]  # BGR -> RGB
        except ImportError:
            pass
        if img is None:
            from PIL import Image

            img = np.asarray(Image.open(_io.BytesIO(value)).convert("RGB"))
        yield img, None


def _iter_cifar10(path):
    """cifar-10-python.tar.gz (dataset_tool.py:139-159)."""
    with tarfile.open(path) as tf:
        for batch in sorted(m.name for m in tf.getmembers()
                            if "data_batch" in m.name or "test_batch" in m.name):
            if "test_batch" in batch:
                continue  # reference uses the 50k train batches
            with tf.extractfile(batch) as f:
                d = pickle.load(f, encoding="latin1")
            images = d["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
            for img, lab in zip(images, d["labels"]):
                yield img, int(lab)


def _iter_mnist(images_path):
    """train-images-idx3-ubyte.gz + sibling labels file
    (dataset_tool.py:163-177)."""
    labels_path = images_path.replace("images-idx3", "labels-idx1")
    with gzip.open(images_path, "rb") as f:
        data = f.read()
    n = int.from_bytes(data[4:8], "big")
    h = int.from_bytes(data[8:12], "big")
    w = int.from_bytes(data[12:16], "big")
    images = np.frombuffer(data, np.uint8, offset=16).reshape(n, h, w)
    with gzip.open(labels_path, "rb") as f:
        ldata = f.read()
    labels = np.frombuffer(ldata, np.uint8, offset=8)
    for img, lab in zip(images, labels):
        yield np.repeat(img[:, :, None], 3, axis=2), int(lab)


def _transform(img: np.ndarray, resolution: tuple[int, int] | None, mode: str):
    if resolution is None:
        return img
    from PIL import Image

    tw, th = resolution
    h, w = img.shape[:2]
    if mode == "center-crop":
        s = min(h, w)
        img = img[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
    elif mode == "center-crop-wide":
        s = min(h, int(w))
        crop_w = min(w, tw * h // th)
        img = img[:, (w - crop_w) // 2:(w + crop_w) // 2]
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((tw, th), Image.LANCZOS))


def convert(source: str, dest: str, resolution: str | None = None,
            transform: str = "center-crop", max_images: int | None = None) -> int:
    res = None
    if resolution:
        a, _, b = resolution.partition("x")
        res = (int(a), int(b or a))

    if os.path.isdir(source) and (
        os.path.exists(os.path.join(source, "data.mdb"))
    ):
        it = _iter_lmdb(source)
    elif source.endswith(".mdb") or source.endswith(".lmdb"):
        it = _iter_lmdb(source)
    elif os.path.isdir(source):
        it = _iter_folder(source)
    elif source.endswith(".zip"):
        it = _iter_zip(source)
    elif "cifar" in os.path.basename(source).lower():
        it = _iter_cifar10(source)
    elif "idx3-ubyte" in source:
        it = _iter_mnist(source)
    else:
        raise SystemExit(f"unrecognized source: {source}")

    from PIL import Image

    labels = []
    count = 0
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zf:
        for img, label in it:
            if max_images is not None and count >= max_images:
                break
            img = _transform(img, res, transform)
            name = f"img{count:08d}.png"
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            zf.writestr(name, buf.getvalue())
            if label is not None:
                labels.append([name, int(label)])
            count += 1
        if labels:
            zf.writestr("dataset.json", json.dumps({"labels": labels}))
    print(f"wrote {count} images to {dest} ({'with' if labels else 'no'} labels)")
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--resolution", default=None, help="WxH")
    p.add_argument("--transform", choices=["center-crop", "center-crop-wide"],
                   default="center-crop")
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args(argv)
    convert(args.source, args.dest, args.resolution, args.transform, args.max_images)


if __name__ == "__main__":
    main()
