"""Lookup tests: exactness vs brute-force match counts + the reference's
statistical recall contract (test/kernel/test_lookup.py:73-75, recall > 0.8)."""
import jax
import jax.numpy as jnp
import numpy as np

from spt_proto_tpu.ops.lookup import pq_match_scores, pq_topk_indices

N_CODE = 16


def brute_counts(qc, kc):
    # qc [S, n_sub], kc [S, n_sub]
    return (qc[:, None, :] == kc[None, :, :]).sum(-1).astype(np.float32)


def test_match_scores_exact():
    rng = np.random.RandomState(0)
    qc = rng.randint(0, N_CODE, size=(2, 32, 8))
    kc = rng.randint(0, N_CODE, size=(2, 32, 8))
    got = np.asarray(pq_match_scores(jnp.asarray(qc), jnp.asarray(kc), N_CODE))
    for b in range(2):
        np.testing.assert_allclose(got[b], brute_counts(qc[b], kc[b]))


def test_topk_indices_causal_and_padded():
    rng = np.random.RandomState(1)
    s, n_sub, top_k = 64, 8, 8
    qc = jnp.asarray(rng.randint(0, N_CODE, size=(1, s, n_sub)))
    kc = jnp.asarray(rng.randint(0, N_CODE, size=(1, s, n_sub)))
    idx = np.asarray(pq_topk_indices(qc, kc, top_k=top_k, n_codewords=N_CODE))
    assert idx.shape == (1, s, top_k)
    for row in range(s):
        vals = idx[0, row]
        valid = vals[vals <= row]
        invalid = vals[vals > row]
        # padding slots are exactly the sentinel S
        assert (invalid == s).all()
        # number of valid slots = min(row+1, top_k)
        assert len(valid) == min(row + 1, top_k)
        assert len(np.unique(valid)) == len(valid)


def test_topk_recall_vs_exact():
    """Our top-k IS exact on the match-count score, so recall vs the exact
    top-k is 1.0 up to ties; assert the reference's 0.8 bar with margin."""
    rng = np.random.RandomState(2)
    s, n_sub, top_k = 128, 8, 16
    qc = rng.randint(0, N_CODE, size=(1, s, n_sub))
    kc = rng.randint(0, N_CODE, size=(1, s, n_sub))
    idx = np.asarray(pq_topk_indices(jnp.asarray(qc), jnp.asarray(kc),
                                     top_k=top_k, n_codewords=N_CODE))[0]
    counts = brute_counts(qc[0], kc[0])
    recalls = []
    for row in range(top_k, s):
        c = counts[row, :row + 1]
        kth = np.sort(c)[::-1][top_k - 1]
        exact = set(np.where(c > kth)[0])  # strictly-above-threshold set
        if not exact:
            continue
        got = set(idx[row][idx[row] <= row])
        recalls.append(len(exact & got) / len(exact))
    assert np.mean(recalls) > 0.95, np.mean(recalls)
