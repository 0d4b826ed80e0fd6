"""Appearance encoder + cosine-softmax re-ID training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.models.reid import PATCH_SHAPE, AppearanceEncoder, extract_patches
from tspn_tpu.tracking.reid_train import train_reid


def test_encoder_outputs_unit_norm(rng):
    enc = AppearanceEncoder()
    x = jnp.asarray(rng.rand(3, *PATCH_SHAPE, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    emb = np.asarray(enc.apply(variables, x, train=False))
    assert emb.shape == (3, 128)
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)


def test_extract_patches_aspect_and_bounds(rng):
    image = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    boxes = np.array([
        [50, 40, 60, 120],     # normal
        [-20, -20, 30, 50],    # clipped at origin
        [290, 190, 50, 50],    # mostly outside
        [100, 100, 0, 0],      # degenerate -> zeros
    ], np.float32)
    patches = extract_patches(image, boxes)
    assert patches.shape == (4, *PATCH_SHAPE, 3)
    assert patches.max() <= 1.0
    assert patches[3].sum() == 0.0


def test_reid_training_separates_identities(rng):
    """Two synthetic identities (distinct color patterns) become separable
    in cosine space after a short training run."""
    def patches_of(identity, n):
        base = np.zeros((n, *PATCH_SHAPE, 3), np.float32)
        base[..., identity % 3] = 0.8
        if identity >= 3:
            base[:, :64] = 0.1  # top-half darkening as a second cue
        return base + rng.rand(n, *PATCH_SHAPE, 3).astype(np.float32) * 0.1

    def batches():
        while True:
            ids = rng.randint(0, 4, size=16)
            x = np.concatenate([patches_of(i, 1) for i in ids])
            yield x, ids.astype(np.int64)

    encode, info = train_reid(batches(), num_identities=4, steps=30, lr=2e-3)
    assert np.isfinite(info["final_metrics"]["loss"])

    a = encode(patches_of(0, 4))
    b = encode(patches_of(1, 4))
    intra = float(np.mean(a @ a.T))
    inter = float(np.mean(a @ b.T))
    assert intra > inter, (intra, inter)


def test_generate_detections_sequence(tmp_path, rng):
    """MOT sequence + det.txt -> detections .npy with appended features."""
    from PIL import Image

    from tools.generate_detections import _load_encoder, generate_sequence

    seq = tmp_path / "MOT-01" / "img1"
    seq.mkdir(parents=True)
    for f in range(1, 4):
        Image.fromarray(
            (rng.rand(120, 160, 3) * 255).astype(np.uint8)
        ).save(seq / f"{f:06d}.jpg")
    det = tmp_path / "det.txt"
    rows = []
    for f in range(1, 4):
        rows.append(f"{f},-1,20,30,40,80,0.9,-1,-1,-1")
        rows.append(f"{f},-1,90,10,30,60,0.8,-1,-1,-1")
    det.write_text("\n".join(rows) + "\n")

    encode = _load_encoder(None)
    out_file = tmp_path / "MOT-01.npy"
    out = generate_sequence(str(tmp_path / "MOT-01"), str(det), str(out_file), encode)
    assert out.shape == (6, 10 + 128)
    # features are unit-norm embeddings
    norms = np.linalg.norm(out[:, 10:], axis=1)
    assert np.allclose(norms, 1.0, atol=1e-3)
    # and the written file round-trips into the tracking app
    from tspn_tpu.tracking.app import gather_sequence_info

    info = gather_sequence_info(str(out_file))
    assert info["feature_dim"] == 128
    assert info["min_frame_idx"] == 1 and info["max_frame_idx"] == 3
