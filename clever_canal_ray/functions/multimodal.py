"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
columns alongside (``media_type``, ``width``/``height``/``duration``).
Decode / feature-extract stages are actor pools: expensive setup
(codec/model init) once per actor in ``__init__``, vectorized batch
work in ``__call__``, small ``batch_size`` because rows are wide.

The real decoders (PIL / torchaudio / ffmpeg) are NOT available in
this container, so the decode kernel is import-gated: with the library
present it would decode; here it raises NotImplementedError unless the
deterministic fake (``fake=True``) is chosen. The Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and
tested (tests/test_functions.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class ImageFeatureExtractor:
    """Actor-pool stage: binary image payload -> fixed-dim feature vector.

    ``fake=True`` (default in this sandbox) computes a deterministic
    8-dim byte-histogram "embedding" so the distributed plumbing can be
    exercised end-to-end without codec libraries.
    """

    def __init__(self, fake: bool = True, dim: int = 8):
        self.dim = dim
        self.fake = fake
        if not fake:
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "real image decode needs PIL; not available in this environment — use fake=True"
                ) from e

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = np.zeros((len(batch), self.dim), dtype=np.float32)
        for i, payload in enumerate(batch["payload"]):
            if not self.fake:  # pragma: no cover
                raise NotImplementedError("real decode path not available in this container")
            buf = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(buf, bins=self.dim, range=(0, 256))
            feats[i] = hist / max(1, len(buf))
        out = batch[["media_id", "media_type", "width", "height"]].copy()
        out["features"] = list(feats)
        out["n_bytes"] = batch["payload"].map(len).astype("int64")
        return out


def extract_features(ds, concurrency: int | tuple[int, int] = 2, batch_size: int = 64, fake: bool = True):
    """Feature-extraction pipeline stage. Small batch_size: media rows
    are wide; batch_size × concurrency payloads must fit worker heaps."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor-pool resize stage: binary image payload -> payload resized
    to (width, height). The real decoder path is import-gated (PIL is
    not in this container); the fake path is a deterministic
    byte-domain downsample (stride-sampled bytes to exactly w*h) so the
    distributed plumbing — schema, dims metadata, batch sizing — is
    exercised end-to-end."""

    def __init__(self, width: int, height: int, fake: bool = True):
        self.w, self.h = int(width), int(height)
        self.fake = fake
        if not fake:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "real image resize needs PIL; not available here — use fake=True"
                ) from e

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        target = self.w * self.h
        out_payloads = []
        for payload in batch["payload"]:
            if not self.fake:  # pragma: no cover
                raise NotImplementedError("real decode path not available in this container")
            buf = np.frombuffer(payload, dtype=np.uint8)
            if len(buf) == 0:
                out_payloads.append(bytes(target))
                continue
            idx = np.linspace(0, len(buf) - 1, target).astype(np.int64)
            out_payloads.append(buf[idx].tobytes())
        out = batch[["media_id", "media_type"]].copy()
        out["payload"] = out_payloads
        out["width"] = np.int32(self.w)
        out["height"] = np.int32(self.h)
        return out


class VideoFrameSampler:
    """Actor-pool frame-sampling stage: a video payload explodes into
    every ``stride``-th frame as its own row (media_id, frame_idx,
    payload). Frames are fixed-size byte windows (``frame_bytes``) —
    the honest stand-in for a codec's frame boundaries; the Ray-side
    shape (1 -> N row explosion, wide binary rows, small batches) is
    the real thing."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = int(frame_bytes)
        self.stride = int(stride)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            buf = np.frombuffer(payload, dtype=np.uint8)
            n_frames = max(1, len(buf) // self.frame_bytes)
            for f in range(0, n_frames, self.stride):
                lo = f * self.frame_bytes
                ids.append(mid)
                idxs.append(f)
                frames.append(buf[lo : lo + self.frame_bytes].tobytes())
        return pd.DataFrame(
            {"media_id": ids, "frame_idx": np.asarray(idxs, dtype=np.int64), "payload": frames}
        )


def resize_images(ds, width: int, height: int, concurrency: int = 2, batch_size: int = 64, fake: bool = True):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height, "fake": fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, frame_bytes: int = 256, stride: int = 4, concurrency: int = 2, batch_size: int = 32):
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthesize_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media corpus for tests/demos."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(64, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.Table.from_pydict(
        {
            "media_id": pa.array([f"m{i:08d}" for i in range(n)], pa.string()),
            "media_type": pa.array(np.where(rng.random(n) < 0.8, "image", "audio"), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 512, size=n, dtype=np.int32), pa.int32()),
            "height": pa.array(rng.integers(16, 512, size=n, dtype=np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
