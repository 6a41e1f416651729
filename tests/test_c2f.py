"""Coarse-to-fine attention vs a brute-force numpy oracle."""

import numpy as np


def _l2(x, axis):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def c2f_oracle(query, key, qf, kf, value, radius, rf, temp, topk):
    hc, wc, C = query.shape
    T = key.shape[0]
    hf, wf, Cf = qf.shape
    Cv = value.shape[-1]
    scale = hf // hc
    query = _l2(query, -1)
    key = _l2(key, -1)
    qf = _l2(qf, -1)
    kf = _l2(kf, -1)
    kf_pad = np.pad(kf, ((0, 0), (rf, rf), (rf, rf), (0, 0)))
    v_pad = np.pad(value, ((0, 0), (rf, rf), (rf, rf), (0, 0)))

    out = np.zeros((hc, wc, Cv))
    for qy in range(hc):
        for qx in range(wc):
            cands = []
            for t in range(T):
                # coarse argmax under circle mask
                best, best_a = None, -np.inf
                for ky in range(hc):
                    for kx in range(wc):
                        if radius is not None and (
                            (ky - qy) ** 2 + (kx - qx) ** 2 >= radius**2
                        ):
                            continue
                        a = query[qy, qx] @ key[t, ky, kx] / temp
                        if a > best_a:
                            best_a, best = a, (ky, kx)
                cy, cx = best[0] * scale, best[1] * scale
                for dy in range(-rf, rf + 1):
                    for dx in range(-rf, rf + 1):
                        a = (
                            qf[qy * scale, qx * scale]
                            @ kf_pad[t, cy + dy + rf, cx + dx + rf]
                            / temp
                        )
                        cands.append((a, v_pad[t, cy + dy + rf, cx + dx + rf]))
            cands.sort(key=lambda c: -c[0])
            top = cands[:topk]
            w = np.array([c[0] for c in top])
            w = np.exp(w - w.max())
            w /= w.sum()
            out[qy, qx] = sum(wi * c[1] for wi, c in zip(w, top))
    return out


def test_c2f_matches_oracle():
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import masked_attention_c2f

    rng = np.random.default_rng(0)
    hc = wc = 4
    scale, rf = 2, 1
    hf = wf = hc * scale
    T, C, Cf, Cv = 2, 6, 6, 3
    query = rng.standard_normal((hc, wc, C)).astype(np.float32)
    key = rng.standard_normal((T, hc, wc, C)).astype(np.float32)
    qf = rng.standard_normal((hf, wf, Cf)).astype(np.float32)
    kf = rng.standard_normal((T, hf, wf, Cf)).astype(np.float32)
    value = rng.standard_normal((T, hf, wf, Cv)).astype(np.float32)

    got = np.asarray(
        masked_attention_c2f(
            jnp.asarray(query), jnp.asarray(key), jnp.asarray(qf),
            jnp.asarray(kf), jnp.asarray(value),
            radius=2.5, radius_fine=rf, temperature=0.1, topk=4,
        )
    )
    expect = c2f_oracle(query, key, qf, kf, value, 2.5, rf, 0.1, 4)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)
