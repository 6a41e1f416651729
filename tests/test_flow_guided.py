"""Flow-guided attention vs a brute-force numpy oracle."""

import numpy as np


def test_flow_guided_attention_matches_oracle():
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import flow_guided_attention

    rng = np.random.default_rng(0)
    T, H, W, Cv, r, k = 2, 6, 6, 3, 1, 4
    corr = rng.standard_normal((T, H, W, H, W)).astype(np.float32)
    # integer flows keep the bilinear/nearest sampling exact for the oracle
    flow = rng.integers(-1, 2, size=(T, H, W, 2)).astype(np.float32)
    value = rng.standard_normal((T, H, W, Cv)).astype(np.float32)

    got = np.asarray(
        flow_guided_attention(
            jnp.asarray(corr), jnp.asarray(flow), jnp.asarray(value),
            radius=r, temperature=0.1, topk=k,
        )
    )

    out = np.zeros((H, W, Cv))
    for qy in range(H):
        for qx in range(W):
            cands = []
            for t in range(T):
                cx = qx + flow[t, qy, qx, 0]
                cy = qy + flow[t, qy, qx, 1]
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        x, y = cx + dx, cy + dy
                        inside = 0 <= x <= W - 1 and 0 <= y <= H - 1
                        a = (
                            corr[t, qy, qx, int(np.clip(y, 0, H - 1)),
                                 int(np.clip(x, 0, W - 1))]
                            if inside
                            else 0.0
                        )  # temperature is dead in the reference (quirk)
                        v = (
                            value[t, int(np.clip(round(y), 0, H - 1)),
                                  int(np.clip(round(x), 0, W - 1))]
                            if inside
                            else np.zeros(Cv)
                        )
                        cands.append((a, v))
            cands.sort(key=lambda c: -c[0])
            top = cands[:k]
            w = np.array([c[0] for c in top])
            w = np.exp(w - w.max())
            w /= w.sum()
            out[qy, qx] = sum(wi * c[1] for wi, c in zip(w, top))

    np.testing.assert_allclose(got, out, rtol=1e-3, atol=1e-4)
