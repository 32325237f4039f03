"""Multimodal column plumbing (task brief): image/audio/video as
opaque `binary` columns with typed metadata.

Image decode has a REAL guarded path: `decode="real"` loads Pillow
once per actor and decodes/thumbnails each payload (raises
NotImplementedError at actor construction when PIL is not importable —
as in this container); `decode="auto"` selects real-when-available,
else the deterministic fake decode (bytes -> seeded pixel/sample
array) so the Ray-side plumbing — schema, actor-pool signature, batch
sizing, output layout — is real and tested end-to-end either way.
Video frame-sampling remains a declared stub (needs pyav).

Scale notes: media payloads are large, so these stages use small
`batch_size` and an actor pool (decoder state initialized once per
actor in __init__); outputs carry fixed-size tensors as
FixedSizeListArray (zero-copy to numpy downstream).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthetic_media_table(n: int, kind: str = "image", seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for tests/benches (payload bytes
    derived from (seed, i); sizes vary)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")}
    for i in range(n):
        size = int(rng.integers(256, 4096))
        payload = hashlib.sha256(f"{seed}/{i}".encode()).digest() * (size // 32 + 1)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload[:size])
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(32, 512)) if kind != "audio" else -1)
        rows["height"].append(int(rng.integers(32, 512)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.integers(500, 60000)) if kind != "image" else -1)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.large_binary()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        }
    )


class DecodeAndFeaturize:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    decode="real": loads Pillow ONCE per actor (__init__) and decodes
    each payload as an image — resize to a dim-sized thumbnail, feature
    vector = row-mean luminance. Raises NotImplementedError at actor
    construction when Pillow is not importable (this container has no
    media libraries).
    decode="fake": deterministic pseudo-decode — features are a seeded
    function of the payload bytes (sha256-expanded), so tests can
    assert exact values and the full actor/batch path runs.
    decode="auto": real when Pillow imports, else fake — the runtime
    selection path."""

    def __init__(self, feature_dim: int = 32, decode: str = "fake"):
        self.dim = feature_dim
        self._image_mod = None
        if decode == "auto":
            decode = "real" if self._try_pillow() else "fake"
        if decode == "real" and not self._try_pillow():
            raise NotImplementedError(
                "real media decode requires pillow (PIL), not importable here; "
                "use decode='fake' (or 'auto') to exercise the pipeline plumbing"
            )
        self.decode = decode

    def _try_pillow(self) -> bool:
        if self._image_mod is None:
            try:
                from PIL import Image  # pillow: public, optional

                self._image_mod = Image
            except ImportError:
                self._image_mod = False
        return bool(self._image_mod)

    def _features_real(self, payload: bytes) -> np.ndarray:
        """Pillow decode -> dim x dim grayscale thumbnail -> row means.
        Undecodable payloads yield a zero vector (corrupt-file policy:
        keep the row, null-like features — never kill the pipeline)."""
        import io

        try:
            img = self._image_mod.open(io.BytesIO(payload)).convert("L")
            img = img.resize((self.dim, self.dim))
            px = np.asarray(img, dtype=np.float64) / 255.0
            return px.mean(axis=1)
        except Exception:
            return np.zeros(self.dim, dtype=np.float64)

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decode == "real":
            return self._features_real(payload)
        # deterministic fake "decode": expand the payload digest into
        # `dim` floats in [0, 1)
        h = hashlib.sha256(payload).digest()
        reps = (self.dim * 8) // len(h) + 1
        raw = (h * reps)[: self.dim * 8]
        ints = np.frombuffer(raw, dtype=np.uint64)
        return (ints >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = np.stack([self._features(p or b"") for p in payloads])
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float64()), self.dim
                ),
                "payload_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            }
        )


def featurize_media(
    ds: Dataset, feature_dim: int = 32, decode: str = "fake",
    batch_size: int = 64, concurrency: tuple[int, int] = (1, 8),
) -> Dataset:
    """media table -> (media_id, kind, features, payload_bytes).
    Small batch_size: payload x batch x concurrency must fit the
    worker heap (large binary payloads)."""
    return ds.map_batches(
        DecodeAndFeaturize,
        fn_constructor_kwargs={"feature_dim": feature_dim, "decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame-sampling stub: emits one row per sampled frame
    (real decoder would seek; fake derives frame bytes from payload +
    frame index). Output: media_id, frame_idx, frame_payload."""

    def __init__(self, fps_divisor: int = 10, max_frames: int = 8, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError("real frame sampling requires pyav")
        self.max_frames = max_frames
        self.fps_divisor = fps_divisor

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for mid, payload, dur in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(), t["duration_ms"].to_pylist()
        ):
            n = min(self.max_frames, max(1, (dur or 0) // (1000 * self.fps_divisor) + 1))
            for fi in range(n):
                ids.append(mid)
                frames.append(fi)
                payloads.append(hashlib.sha256((payload or b"") + fi.to_bytes(4, "big")).digest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frames, pa.int32()),
                "frame_payload": pa.array(payloads, pa.large_binary()),
            }
        )


def sample_frames(ds: Dataset, **kw) -> Dataset:
    batch_size = kw.pop("batch_size", 32)
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )
