"""Train a REAL two-layer conv checkpoint for the LPIPS-shaped metric.

VERDICT r12 item 6 asked for real (non-hand-picked) tensors through
`lpips_shape_distance`'s broadcast path. The torch-converted LPIPS
weights are unobtainable here (no network route — see SCALE.md T7/P7
notes), so this script TRAINS the checkpoint in-sandbox instead: the 12
parameters (two 2x2 conv kernels + 2 layer weights) are optimized by
finite-difference gradient descent on a perceptual margin-ranking
objective over deterministic synthetic 8x8 image pairs —

  close pairs:  an image vs. itself shifted by one pixel, or under a
                small uniform brightness change (perceptually near);
  far pairs:    the same image under heavy iid pixel noise, or a
                different image entirely (perceptually far);
  loss:         sum of max(0, margin - (d_far - d_close)) over a
                paired batch, i.e. the metric must rank every far pair
                above its close counterpart by the margin.

The objective replays the EXACT production dataflow (conv -> ReLU ->
channel unit-norm -> squared-diff spatial mean -> learned layer mix)
minus the 2^-20 grid snap (non-differentiable; reapplied implicitly at
inference). Trained weights are snapped to the 2^-10 dyadic grid — the
metric's cross-engine exactness contract (media/images.py::_LPIPS_EPS
note) requires dyadic rationals — re-scored after snapping, and saved
to tests/fixtures/lpips_trained.npz, which
tests/test_media.py::test_lpips_trained_checkpoint_discriminates
drives through the Spark mapInPandas path.

Run: python scripts/train_lpips_fixture.py   (rewrites the fixture;
deterministic — same seed, same schedule, same tensors every run)
"""
from __future__ import annotations

import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "fixtures", "lpips_trained.npz")

EPS = 2.0 ** -20
SIZE = 8
MARGIN = 0.08
GRID = 2.0 ** -10  # dyadic snap for the cross-engine exactness contract


def _conv_relu(a: np.ndarray, k: np.ndarray) -> np.ndarray:
    f = (
        k[0, 0] * a[0::2, 0::2, :]
        + k[0, 1] * a[0::2, 1::2, :]
        + k[1, 0] * a[1::2, 0::2, :]
        + k[1, 1] * a[1::2, 1::2, :]
    )
    return np.maximum(f, 0.0)


def _unit(f: np.ndarray) -> np.ndarray:
    ssq = (f * f).sum(axis=2, keepdims=True) + EPS
    return f / np.sqrt(ssq)


def distance(x: np.ndarray, y: np.ndarray, p: np.ndarray) -> float:
    """The production dataflow (media/images.py::lpips_shape_distance)
    without the grid snap: p = [k1(4), k2(4), lw(2)]."""
    k1 = p[0:4].reshape(2, 2)
    k2 = p[4:8].reshape(2, 2)
    lw = p[8:10]
    qx1, qy1 = _unit(_conv_relu(x, k1)), _unit(_conv_relu(y, k1))
    d1 = float(((qx1 - qy1) ** 2).sum()) / (qx1.shape[0] ** 2)
    qx2, qy2 = _unit(_conv_relu(qx1, k2)), _unit(_conv_relu(qy1, k2))
    d2 = float(((qx2 - qy2) ** 2).sum()) / (qx2.shape[0] ** 2)
    return float(lw[0] * d1 + lw[1] * d2)


def make_pairs(rng: np.random.Generator, n: int = 48):
    """n (base, close, far) triples of 8x8x3 images in [0, 255]."""
    triples = []
    for i in range(n):
        kind = i % 4
        g = np.zeros((SIZE, SIZE, 3))
        xs = np.arange(SIZE)
        if kind == 0:  # horizontal gradient per channel
            g += (xs[None, :, None] * 32.0) % 256
        elif kind == 1:  # vertical stripes
            g += ((xs[None, :, None] // 2) % 2) * 200.0
        elif kind == 2:  # checkerboard
            g += (((xs[:, None, None] + xs[None, :, None]) % 2) * 180.0) + 30
        else:  # random texture
            g += rng.uniform(0, 255, size=(SIZE, SIZE, 3))
        g = np.clip(g + rng.uniform(-10, 10, size=g.shape), 0, 255)
        if i % 2 == 0:
            close = np.roll(g, 1, axis=1)  # one-pixel shift
        else:
            close = np.clip(g + rng.uniform(-8, 8), 0, 255)  # brightness
        if i % 3 == 0:
            far = np.clip(g + rng.uniform(-90, 90, size=g.shape), 0, 255)
        else:  # a different base image
            far = np.clip(
                rng.uniform(0, 255, size=g.shape) * 0.7 + g * 0.3, 0, 255
            )
        triples.append((g, close, far))
    return triples


def loss(p: np.ndarray, triples) -> float:
    tot = 0.0
    for g, close, far in triples:
        dc = distance(g, close, p)
        df = distance(g, far, p)
        tot += max(0.0, MARGIN - (df - dc))
    # keep the layer mix a bounded positive combination (LPIPS's learned
    # linear layer is non-negative); soft barrier, off at healthy values
    tot += 10.0 * float(np.maximum(0.0, 0.05 - p[8:10]).sum())
    tot += 0.1 * float(np.maximum(0.0, np.abs(p) - 4.0).sum())
    return tot


def main() -> None:
    rng = np.random.default_rng(13)
    triples = make_pairs(rng)
    # deliberately DE-TUNED init (not the registry's hand-picked
    # kernels): near-uniform boxes + equal layer mix, so the final
    # tensors are the product of the descent, not the starting point
    p = np.array(
        [0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.5, 0.5], dtype=np.float64
    )
    l0 = loss(p, triples)
    h = 1e-4
    lr = 0.05
    for step in range(200):
        g = np.zeros_like(p)
        base = loss(p, triples)
        for j in range(p.size):
            q = p.copy()
            q[j] += h
            g[j] = (loss(q, triples) - base) / h
        gn = float(np.linalg.norm(g))
        if gn < 1e-9:
            break
        p -= lr * g / max(gn, 1.0)
        if step % 25 == 0:
            print(f"step {step:3d}  loss {base:.6f}")
    # dyadic snap (exactness contract), then confirm it held the margin
    p = np.round(p / GRID) * GRID
    lf = loss(p, triples)
    ok = sum(
        1
        for gg, c, f in triples
        if distance(gg, f, p) > distance(gg, c, p)
    )
    print(f"loss {l0:.6f} -> {lf:.6f} (after dyadic snap)")
    print(f"ranking accuracy: {ok}/{len(triples)} far>close")
    if ok < len(triples):
        raise SystemExit("training did not reach perfect ranking")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(
        OUT,
        conv1=p[0:4].reshape(2, 2),
        conv2=p[4:8].reshape(2, 2),
        layer_w=p[8:10],
    )
    print("wrote", OUT)
    print("conv1", p[0:4].reshape(2, 2).tolist())
    print("conv2", p[4:8].reshape(2, 2).tolist())
    print("layer_w", p[8:10].tolist())


if __name__ == "__main__":
    main()
