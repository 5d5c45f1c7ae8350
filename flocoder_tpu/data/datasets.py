"""Datasets and the host→device input pipeline.

Reference: flocoder/data.py — ``fast_scandir`` (:17-43), ``PairDataset``
(:120-143), ``ImageListDataset`` with RAM cache (:146-192), ``PreEncodedDataset``
of saved latents with class-subdir labels (:311-384), ``InfiniteDataset``
(:287-307), ``create_image_loaders`` (:434-480). The reference rides
torch DataLoader worker processes; here the pipeline is a thread-pool
prefetcher producing stacked numpy NHWC batches (threads suffice — PIL/numpy
release the GIL for the heavy ops — and a C++ decoder can slot in under the
same interface later).

Latent files are ``.npy``/``.npz`` (this framework's pre-encode output);
``.pt`` files from the torch reference are also readable when torch is
installed (checkpoint-format compatibility, SURVEY.md §5.4).
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = ["fast_scandir", "ImageFolderDataset", "PreEncodedDataset",
           "SyntheticImageDataset", "Loader", "create_image_loaders"]

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
LATENT_EXTS = (".npy", ".npz", ".pt")


def fast_scandir(path: str, exts: Sequence[str]) -> Tuple[List[str], List[str]]:
    """Recursive scan for files with given extensions
    (reference: data.py:17-43). Returns (subdirs, files), both sorted."""
    subdirs, files = [], []
    for root, dirs, names in os.walk(path):
        for d in dirs:
            subdirs.append(os.path.join(root, d))
        for n in names:
            if os.path.splitext(n)[1].lower() in exts:
                files.append(os.path.join(root, n))
    return sorted(subdirs), sorted(files)


class ImageFolderDataset:
    """Images under a directory tree; class label = first-level subdir name
    when subdirs exist, else 0. Optional whole-dataset RAM cache
    (reference: data.py:146-192)."""

    def __init__(self, path: str, transform: Optional[Callable] = None,
                 cache: bool = True):
        self.path = os.path.expanduser(path)
        _, self.files = fast_scandir(self.path, IMG_EXTS)
        if not self.files:
            raise FileNotFoundError(f"no images under {self.path}")
        tops = sorted({self._top(f) for f in self.files})
        self.class_names = tops
        self.class_map = {c: i for i, c in enumerate(tops)}
        self.transform = transform
        self._cache: dict = {} if cache else None

    def _top(self, f: str) -> str:
        rel = os.path.relpath(f, self.path)
        parts = rel.split(os.sep)
        return parts[0] if len(parts) > 1 else ""

    @property
    def n_classes(self) -> int:
        return len(self.class_names) if self.class_names != [""] else 0

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int):
        return self.get(i, np.random.default_rng())

    def get(self, i: int, rng: np.random.Generator):
        f = self.files[i]
        if self.transform is not None and \
                getattr(self.transform, "wants_path", False):
            # path-based transforms (data/native_image.NativeLoadResized) do
            # the decode themselves in C++ — skip the PIL open entirely
            label = self.class_map[self._top(f)]
            try:
                return self.transform(f, rng), np.int32(label)
            except Exception as e:
                print(f"ImageFolderDataset: failed to load {f} ({e}); "
                      "redrawing")
                j = int(rng.integers(0, len(self.files)))
                return self.get(j if j != i else (i + 1) % len(self.files),
                                rng)
        try:
            if self._cache is not None and f in self._cache:
                img = self._cache[f]
            else:
                img = Image.open(f).convert("RGB")
                img.load()
                if self._cache is not None:
                    self._cache[f] = img
        except Exception as e:
            # corrupt-file tolerance: redraw another item instead of dying
            # (reference: data.py:186-191, 380-384 returns a zero fallback;
            # a redraw keeps batch statistics clean)
            print(f"ImageFolderDataset: failed to load {f} ({e}); redrawing")
            j = int(rng.integers(0, len(self.files)))
            return self.get(j if j != i else (i + 1) % len(self.files), rng)
        label = self.class_map[self._top(f)]
        out = self.transform(img, rng) if self.transform else np.asarray(img)
        return out, np.int32(label)


class SyntheticImageDataset:
    """Deterministic procedural images for tests/benches where no dataset is
    on disk (this environment has no network egress for torchvision
    downloads). Class k = a colored blob pattern."""

    def __init__(self, n: int = 256, image_size: int = 64, n_classes: int = 4,
                 transform: Optional[Callable] = None, seed: int = 0):
        self.n, self.image_size = n, image_size
        self._n_classes = n_classes
        self.transform = transform
        self.seed = seed

    @property
    def n_classes(self) -> int:
        return self._n_classes

    def __len__(self):
        return self.n

    def get(self, i: int, rng: np.random.Generator):
        g = np.random.default_rng(self.seed + i)
        label = i % self._n_classes
        s = self.image_size
        yy, xx = np.mgrid[0:s, 0:s] / s
        cx, cy = g.uniform(0.3, 0.7, 2)
        r = g.uniform(0.1, 0.3)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / r ** 2)
        color = np.zeros(3)
        color[label % 3] = 1.0
        arr = (blob[..., None] * color[None, None, :] * 255).astype(np.uint8)
        img = Image.fromarray(arr)
        out = self.transform(img, rng) if self.transform else np.asarray(
            img, np.float32) / 255.0
        return out, np.int32(label)


class PreEncodedDataset:
    """Latent files saved by the pre-encode pass (reference: data.py:311-384):
    class subdirectories are labels; files are .npy (plain latent), .npz
    (inpainting dict {target_latents, source_latents, mask_pixels}), or
    torch .pt from the reference. Random-replacement RAM cache like the
    reference's."""

    def __init__(self, path: str, n_classes: int = 0, cache_size: int = 20000):
        self.path = os.path.expanduser(path)
        subdirs, self.files = fast_scandir(self.path, LATENT_EXTS)
        if not self.files:
            raise FileNotFoundError(f"no latent files under {self.path}")
        tops = sorted({self._top(f) for f in self.files})
        self.class_map = {c: i for i, c in enumerate(tops)}
        self.n_classes = n_classes or (len(tops) if tops != [""] else 0)
        self.cache_size = cache_size
        self._cache: dict = {}
        self._inpainting = None  # lazily probed

    def _top(self, f: str) -> str:
        rel = os.path.relpath(f, self.path)
        parts = rel.split(os.sep)
        return parts[0] if len(parts) > 1 else ""

    def __len__(self):
        return len(self.files)

    @property
    def is_inpainting(self) -> bool:
        if self._inpainting is None:
            sample = self._load(self.files[0])
            self._inpainting = isinstance(sample, dict)
        return self._inpainting

    def _load(self, f: str):
        ext = os.path.splitext(f)[1].lower()
        if ext == ".npy":
            return np.load(f)
        if ext == ".npz":
            with np.load(f) as z:
                if set(z.files) == {"latents"}:
                    return z["latents"]
                return {k: z[k] for k in z.files}
        if ext == ".pt":  # torch reference files
            import torch
            obj = torch.load(f, map_location="cpu", weights_only=True)
            if isinstance(obj, dict):
                return {k: self._torch_to_nhwc(v) for k, v in obj.items()}
            return self._torch_to_nhwc(obj)
        raise ValueError(f"unknown latent file {f}")

    @staticmethod
    def _torch_to_nhwc(t):
        arr = np.asarray(t.detach().float().numpy() if hasattr(t, "detach")
                         else t)
        if arr.ndim == 3:      # CHW → HWC
            arr = np.transpose(arr, (1, 2, 0))
        return arr

    def get(self, i: int, rng: np.random.Generator):
        f = self.files[i]
        if f in self._cache:
            data = self._cache[f]
        else:
            data = self._load(f)
            if len(self._cache) >= self.cache_size:
                # random replacement (reference: data.py:357-366)
                victim = list(self._cache)[int(rng.integers(len(self._cache)))]
                del self._cache[victim]
            self._cache[f] = data
        label = np.int32(self.class_map.get(self._top(f), 0))
        return data, label


class Loader:
    """Thread-pool batch loader with prefetch (DataLoader replacement).
    Yields dict batches {'target': ..., 'class_cond': ...} or, for inpainting
    datasets, adds {'source', 'mask_pixels'} — stacked numpy NHWC arrays,
    dropping the last partial batch (static shapes for jit)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, prefetch: int = 2,
                 key: str = "target", host_shard: Optional[Tuple[int, int]] = None):
        """``host_shard=(host_id, n_hosts)`` makes this loader serve only its
        host's slice of each (identically seeded) global shuffle — the
        per-host input pipeline for multi-host training (SURVEY.md §5.8;
        wire with ``jax.process_index()``/``jax.process_count()``)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.key = key
        self.host_shard = host_shard
        self._epoch = 0

    def _host_slice(self, order: np.ndarray) -> np.ndarray:
        if not self.host_shard:
            return order
        host_id, n_hosts = self.host_shard
        per = len(order) // n_hosts
        return order[host_id * per:(host_id + 1) * per]

    def __len__(self):
        n = len(self.dataset)
        if self.host_shard:
            n = n // self.host_shard[1]
        return n // self.batch_size

    def _assemble(self, items) -> dict:
        datas, labels = zip(*items)
        batch: dict = {"class_cond": np.stack(labels)}
        if isinstance(datas[0], dict) and "target" in datas[0]:
            # PairDataset items {'source', 'target'} (reference data.py:120-
            # 143, source == target): stack once and ALIAS the duplicate —
            # the reference's DataLoader collates both copies.
            batch[self.key] = np.stack([d["target"]
                                        for d in datas]).astype(np.float32)
            if all(d["source"] is d["target"] for d in datas):
                batch["source"] = batch[self.key]
            else:
                batch["source"] = np.stack([d["source"] for d in datas]
                                           ).astype(np.float32)
            return batch
        if isinstance(datas[0], dict):
            batch[self.key] = np.stack([d["target_latents"] for d in datas])
            if "source_latents" in datas[0]:
                batch["source"] = np.stack([d["source_latents"]
                                            for d in datas])
            if "mask_pixels" in datas[0]:
                mp = np.stack([np.asarray(d["mask_pixels"], np.float32)
                               for d in datas])
                if mp.ndim == 3:
                    mp = mp[..., None]
                batch["mask_pixels"] = mp
        else:
            batch[self.key] = np.stack(datas).astype(np.float32)
        return batch

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        order = self._host_slice(order)
        n_batches = len(self)
        if hasattr(self.dataset, "get_batch"):
            # shard-backed dataset: one native gather per batch
            yield from self._iter_shard(order, n_batches)
            return
        # Two pools: batch assemblers must never share workers with item
        # loaders (same-pool nesting deadlocks when all workers hold batch
        # tasks that wait on item futures).
        item_pool = ThreadPoolExecutor(self.num_workers)
        batch_pool = ThreadPoolExecutor(max(1, self.prefetch))
        try:
            def make_batch(b):
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                item_rngs = [np.random.default_rng(rng.integers(2 ** 31))
                             for _ in idxs]
                items = list(item_pool.map(
                    lambda a: self.dataset.get(int(a[0]), a[1]),
                    zip(idxs, item_rngs)))
                return self._assemble(items)

            pending: "queue.Queue" = queue.Queue()
            n_ahead = min(self.prefetch, n_batches)
            for b in range(n_ahead):
                pending.put(batch_pool.submit(make_batch, b))
            for b in range(n_batches):
                fut = pending.get()
                if b + n_ahead < n_batches:
                    pending.put(batch_pool.submit(make_batch, b + n_ahead))
                yield fut.result()
        finally:
            batch_pool.shutdown(wait=False, cancel_futures=True)
            item_pool.shutdown(wait=False, cancel_futures=True)

    def _iter_shard(self, order, n_batches) -> Iterator[dict]:
        pool = ThreadPoolExecutor(max(1, self.prefetch))
        try:
            def make(b):
                idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                return self.dataset.get_batch(idx)

            pending: "queue.Queue" = queue.Queue()
            n_ahead = min(self.prefetch, n_batches)
            for b in range(n_ahead):
                pending.put(pool.submit(make, b))
            for b in range(n_batches):
                fut = pending.get()
                if b + n_ahead < n_batches:
                    pending.put(pool.submit(make, b + n_ahead))
                yield fut.result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


class TorchvisionDataset:
    """Adapter over a torchvision dataset (PIL image, int label) to this
    module's ``get(i, rng)`` protocol — the dispatch-by-name path for
    {Flowers102, STL10, Food101} (reference: data.py:448-457). Only reachable
    where torchvision + network egress exist; callers fall back otherwise."""

    def __init__(self, tv_dataset, transform: Optional[Callable] = None,
                 n_classes: int = 0):
        self.base = tv_dataset
        self.transform = transform
        self.n_classes = n_classes

    def __len__(self):
        return len(self.base)

    def get(self, i: int, rng: np.random.Generator):
        img, label = self.base[int(i)]
        if self.transform is not None:
            img = self.transform(img, rng)
        return img, np.int32(label)


def dataset_by_name(data_path: str, split: str, transform: Callable):
    """The reference's dispatch-by-name shim (data.py:448-457 /
    preencode_data.py:45-53): 'flowers' → torchvision Flowers102 (wrapped
    ColorAware below by the caller), 'stl10' → STL10, 'food101' → Food101,
    downloading when egress exists. Returns None when the name doesn't match
    or torchvision/download is unavailable, so callers keep the
    folder/synthetic fallback."""
    name = str(data_path).lower()
    try:
        from torchvision import datasets as tvd
    except ImportError:
        return None
    try:
        if "flowers" in name:
            tv = tvd.Flowers102(root=data_path, split=split,
                                download=True)
            return TorchvisionDataset(tv, transform, n_classes=102)
        if "stl10" in name:
            tv = tvd.STL10(root=data_path,
                           split=("train" if split == "train" else "test"),
                           download=True)
            return TorchvisionDataset(tv, transform, n_classes=10)
        if "food101" in name:
            tv = tvd.Food101(root=data_path,
                             split=("train" if split == "train" else "test"),
                             download=True)
            return TorchvisionDataset(tv, transform, n_classes=101)
    except Exception as e:  # no egress / corrupt download → fallback
        print(f"dataset_by_name({data_path}): {type(e).__name__}: {e}; "
              "falling back to folder/synthetic")
    return None


def create_image_loaders(batch_size: int, image_size: int, data_path: str,
                         num_workers: int = 4, is_midi: bool = False,
                         config=None, val_frac: float = 0.1,
                         seed: int = 0) -> Tuple[Loader, Loader]:
    """Train/val image loaders by dataset path (reference: data.py:434-480):
    name-dispatch to torchvision {flowers → ColorAware(Flowers102), stl10,
    food101} where egress exists, else an existing directory is an image
    folder and missing paths fall back to a synthetic dataset. Both loaders
    serve ``PairDataset``-wrapped items ((source, target) with source ==
    target, reference data.py:476-477) — the Loader aliases the duplicate
    array instead of stacking it twice."""
    from .transforms import image_transforms, midi_transforms

    tf = (midi_transforms(image_size) if is_midi
          else image_transforms(image_size))
    path = os.path.expanduser(data_path)
    named = dataset_by_name(path, "train", tf)
    if named is not None:
        if "flowers" in path.lower():
            # red/blue rejection sampling for Flowers (reference:
            # data.py:450-451 wraps ColorAwareDataset around Flowers102)
            named = ColorAwareDataset(named)
        dataset = named
    elif os.path.isdir(path):
        if is_midi and fast_scandir(path, (".mid", ".midi"))[1]:
            # raw MIDI corpus → convert to piano-roll images once, then
            # treat as an image dataset (reference: data.py:195-283)
            dataset = MIDIImageDataset(path, split="train", transform=tf,
                                       num_workers=num_workers)
        else:
            dataset = ImageFolderDataset(path, transform=tf)
    else:
        dataset = SyntheticImageDataset(image_size=image_size, transform=tf)

    n = len(dataset)
    idx = np.arange(n)
    np.random.default_rng(seed).shuffle(idx)
    n_val = max(1, int(n * val_frac))

    class _Subset:
        def __init__(self, base, ids):
            self.base, self.ids = base, ids
            self.n_classes = getattr(base, "n_classes", 0)

        def __len__(self):
            return len(self.ids)

        def get(self, i, rng):
            return self.base.get(int(self.ids[i]), rng)

    # clamp per-split batch size so tiny splits still yield ≥1 batch
    train = Loader(PairDataset(_Subset(dataset, idx[n_val:])),
                   max(1, min(batch_size, n - n_val)), True, num_workers, seed)
    val = Loader(PairDataset(_Subset(dataset, idx[:n_val])),
                 max(1, min(batch_size, n_val)), True, num_workers, seed + 1)
    return train, val


class PairDataset:
    """Wraps a dataset to yield (src, cls, tgt, cls) pairs where src == tgt
    (reference: data.py:120-143 — used when source and target are the same
    image; kept for non-pre-encoded training parity)."""

    def __init__(self, base):
        self.base = base
        self.n_classes = getattr(base, "n_classes", 0)

    def __len__(self):
        return len(self.base)

    def get(self, i: int, rng: np.random.Generator):
        img, label = self.base.get(i, rng)
        return {"source": img, "target": img}, label


class InfiniteDataset:
    """Random-with-replacement sampler view over a dataset so each pass
    re-randomizes the frozen augmentations (reference: data.py:287-307).
    ``length`` controls the nominal epoch length."""

    def __init__(self, base, length: Optional[int] = None, seed: int = 0):
        self.base = base
        self.length = length or len(base)
        self.n_classes = getattr(base, "n_classes", 0)
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return self.length

    def get(self, i: int, rng: np.random.Generator):
        j = int(rng.integers(0, len(self.base)))
        return self.base.get(j, rng)


class ColorAwareDataset:
    """Rejection-samples toward color-diverse items: items whose red or blue
    channel dominates are kept preferentially (reference: data.py:389-423,
    the Flowers red/blue balance trick)."""

    def __init__(self, base, max_tries: int = 8):
        self.base = base
        self.max_tries = max_tries
        self.n_classes = getattr(base, "n_classes", 0)

    def __len__(self):
        return len(self.base)

    @staticmethod
    def _is_redblue(img: np.ndarray) -> bool:
        if img.ndim != 3 or img.shape[-1] < 3:
            return False
        means = img.reshape(-1, img.shape[-1]).mean(axis=0)
        return bool(means[0] > means[1] or means[2] > means[1])

    def get(self, i: int, rng: np.random.Generator):
        img, label = self.base.get(i, rng)
        tries = 0
        while not self._is_redblue(np.asarray(img)) and tries < self.max_tries:
            j = int(rng.integers(0, len(self.base)))
            img, label = self.base.get(j, rng)
            tries += 1
        return img, label


POP909_URL = ("https://github.com/music-x-lab/POP909-Dataset/raw/refs/"
              "heads/master/POP909.zip")


def maybe_download_pop909(root: str, url: str = POP909_URL) -> Optional[str]:
    """Egress-gated POP909 fetch (reference: data.py:199,214-216 downloads
    and extracts the zip via torchvision utils). Downloads ``url`` into
    ``root`` and extracts it; returns the extracted directory, or None on
    any failure (no egress, bad archive) so callers keep the local-corpus
    path. ``file://`` URLs work too, which is how the test suite exercises
    the extraction without network."""
    import urllib.request
    import zipfile
    name = url.rsplit("/", 1)[-1]
    out_dir = os.path.join(root, name[:-4] if name.endswith(".zip") else name)
    if os.path.isdir(out_dir) and fast_scandir(out_dir, (".mid", ".midi"))[1]:
        return out_dir
    try:
        os.makedirs(root, exist_ok=True)
        zip_path = os.path.join(root, name)
        if not os.path.isfile(zip_path):
            with urllib.request.urlopen(url, timeout=60) as r, \
                    open(zip_path + ".part", "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(zip_path + ".part", zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(root)
        return out_dir if os.path.isdir(out_dir) else root
    except Exception as e:  # no egress / corrupt archive → local fallback
        print(f"maybe_download_pop909: {type(e).__name__}: {e}; "
              "expecting a local MIDI corpus")
        return None


class MIDIImageDataset:
    """Piano-roll images converted from a MIDI corpus (reference:
    data.py:195-283). When ``download=True`` and ``midi_dir`` holds no MIDI
    files, attempts the reference's POP909 zip fetch (egress-gated,
    ``maybe_download_pop909``); otherwise point ``midi_dir`` at an existing
    corpus. ``skip_versions`` drops the ``versions/`` alternate takes of
    each song (reference :219-220); ``total_only`` keeps only the _TOTAL
    roll per song (reference :240-242). Conversion runs once via a thread
    pool into ``image_dir``; song-directory number splits train/val like
    the reference (:266-275)."""

    def __init__(self, midi_dir: str, image_dir: Optional[str] = None,
                 split: str = "train", val_mod: int = 10,
                 transform: Optional[Callable] = None,
                 num_workers: int = 4, download: bool = True,
                 skip_versions: bool = True, total_only: bool = False,
                 url: str = POP909_URL):
        from .pianoroll import midi_to_pr_img
        self.midi_dir = os.path.expanduser(midi_dir)
        self.image_dir = image_dir or self.midi_dir.rstrip("/") + "_images"
        _, midis = fast_scandir(self.midi_dir, (".mid", ".midi"))
        if not midis and download:
            got = maybe_download_pop909(self.midi_dir, url=url)
            if got:
                self.image_dir = (image_dir
                                  or got.rstrip("/") + "_images")
                _, midis = fast_scandir(got, (".mid", ".midi"))
        if skip_versions:
            midis = [m for m in midis
                     if f"{os.sep}versions{os.sep}" not in m]
        if not midis:
            raise FileNotFoundError(f"no MIDI files under {self.midi_dir}")
        if not os.path.isdir(self.image_dir) or not fast_scandir(
                self.image_dir, IMG_EXTS)[1]:
            os.makedirs(self.image_dir, exist_ok=True)
            with ThreadPoolExecutor(num_workers) as pool:
                list(pool.map(
                    lambda m: midi_to_pr_img(m, self.image_dir), midis))
        _, files = fast_scandir(self.image_dir, IMG_EXTS)
        if total_only:
            # keep only the _TOTAL roll of each song (reference :240-242)
            files = [f for f in files if "_TOTAL" in os.path.basename(f)]

        def song_num(f: str) -> int:
            base = os.path.basename(os.path.dirname(f))
            digits = "".join(c for c in base if c.isdigit()) or "0"
            return int(digits)

        if split == "val":
            files = [f for f in files if song_num(f) % val_mod == 0]
        else:
            files = [f for f in files if song_num(f) % val_mod != 0]
        self.files = files
        self.transform = transform
        self.n_classes = 0

    def __len__(self):
        return len(self.files)

    def get(self, i: int, rng: np.random.Generator):
        img = Image.open(self.files[i]).convert("RGB")
        out = self.transform(img, rng) if self.transform else np.asarray(
            img, np.float32) / 255.0
        return out, np.int32(0)


class InpaintingDataset:
    """Yields {source_image, mask_pixels, target_image} per item: the target
    image plus a generated mask and the masked image (reference:
    inpainting.py:411-441). Pixel-space; the pre-encode pass turns these
    into latent triplets."""

    def __init__(self, base, mask_kwargs: Optional[dict] = None):
        from ..inpainting import generate_mask
        self._generate_mask = generate_mask
        self.base = base
        self.mask_kwargs = mask_kwargs or {}
        self.n_classes = getattr(base, "n_classes", 0)

    def __len__(self):
        return len(self.base)

    def get(self, i: int, rng: np.random.Generator):
        img, label = self.base.get(i, rng)
        img = np.asarray(img, np.float32)
        mask = self._generate_mask(img.shape[:2], rng=rng,
                                   **self.mask_kwargs)[..., None]
        return {"target_latents": img, "source_latents": img * (1 - mask),
                "mask_pixels": mask}, label
