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


def extract_features(ds, concurrency: int = 2, batch_size: int = 64, fake: bool = True):
    """Feature-extraction pipeline stage. Small batch_size: media rows
    are wide; batch_size × concurrency payloads must fit worker heaps."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"fake": fake},
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
