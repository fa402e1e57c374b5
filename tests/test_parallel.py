"""Sharded chaining over the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from muchsalsa_tpu.ops.chaining_jax import chain_dp_batch
from muchsalsa_tpu.parallel.mesh import make_mesh
from muchsalsa_tpu.parallel.sharded import sharded_chain_dp


def make_batch(rng, B, K):
    """Random colinear-ish batch; values only need to be well-formed."""
    arrs = {}
    ns = rng.integers(0, 5000, (B, K)).astype(np.float64)
    span = rng.integers(400, 1200, (B, K)).astype(np.float64)
    arrs["v_ns"], arrs["v_ne"] = ns, ns + span
    ns2 = rng.integers(0, 5000, (B, K)).astype(np.float64)
    arrs["w_ns"], arrs["w_ne"] = ns2, ns2 + span
    is_ = rng.integers(0, 200, (B, K)).astype(np.float64)
    arrs["v_is"], arrs["v_ie"] = is_, is_ + span
    arrs["w_is"], arrs["w_ie"] = is_, is_ + span
    arrs["ov_s"], arrs["ov_e"] = is_ + 10, is_ + span - 10
    arrs["v_rr"] = np.ones((B, K))
    arrs["w_rr"] = np.ones((B, K))
    arrs["score"] = rng.integers(400, 1500, (B, K)).astype(np.float64)
    arrs["v_dir"] = rng.integers(0, 2, (B, K)).astype(bool)
    arrs["w_dir"] = rng.integers(0, 2, (B, K)).astype(bool)
    arrs["valid"] = np.ones((B, K), dtype=bool)
    batch = {k: jnp.asarray(v) for k, v in arrs.items()}
    batch["cls_dir"] = jnp.asarray(np.ones(B, dtype=bool))
    return batch


def test_sharded_matches_single_device(rng):
    assert len(jax.devices()) == 8
    B, K = 16, 8
    batch = make_batch(rng, B, K)

    scores_ref, bps_ref = chain_dp_batch(batch, 300)

    mesh = make_mesh()
    scores, bps, stats = sharded_chain_dp(batch, 300, mesh)

    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores_ref))
    np.testing.assert_array_equal(np.asarray(bps), np.asarray(bps_ref))
    # psum-merged stats cover the full batch
    assert int(np.asarray(stats)[0]) == B


def test_sharded_smaller_mesh(rng):
    B, K = 8, 8
    batch = make_batch(rng, B, K)
    mesh = make_mesh(4)
    scores, bps, stats = sharded_chain_dp(batch, 300, mesh)
    assert scores.shape == (B, K)
    assert int(np.asarray(stats)[0]) == B


def test_sharded_anchor_counts(rng):
    import jax.numpy as jnp

    from muchsalsa_tpu.ops.minimizer import minimizers
    from muchsalsa_tpu.ops.minimizer_jax import anchor_counts
    from muchsalsa_tpu.parallel.sharded import sharded_anchor_counts
    from muchsalsa_tpu.testing.simulate import random_genome
    from tests.test_minimizer_jax import pad_batch

    genome = random_genome(rng, 6000)
    unitig = genome[2000:3200]
    _, hh, _ = minimizers(unitig, 15, 5)
    index = jnp.asarray(np.sort(hh))

    reads = [genome[i * 700 : i * 700 + 1500] for i in range(8)]
    codes, lens = pad_batch(reads)

    ref = np.asarray(anchor_counts(codes, lens, index, 15, 5))

    mesh = make_mesh()
    counts, stats = sharded_anchor_counts(codes, lens, index, mesh, 15, 5)
    np.testing.assert_array_equal(np.asarray(counts), ref)
    assert int(np.asarray(stats)[1]) == int(ref.sum())


def test_sharded_myers(rng):
    from muchsalsa_tpu.ops.align import edit_distance_np, pack_problems
    from muchsalsa_tpu.parallel.sharded import sharded_myers
    from muchsalsa_tpu.testing.simulate import random_genome
    from tests.test_align import mutate

    pairs = []
    for _ in range(8):
        q = random_genome(rng, int(rng.integers(40, 120)))
        pairs.append((q, mutate(rng, q, 0.1)))
    args = pack_problems(pairs)
    expected = np.array([edit_distance_np(q, t) for q, t in pairs])

    mesh = make_mesh()
    d, total = sharded_myers(*args, mesh)
    np.testing.assert_array_equal(np.asarray(d), expected)
    assert int(np.asarray(total)) == int(expected.sum())


def test_sharded_map_reads_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from muchsalsa_tpu.config import MapperConfig
    from muchsalsa_tpu.io.fasta import SequenceStore
    from muchsalsa_tpu.ops.mapping_jax import map_reads_device
    from muchsalsa_tpu.parallel.sharded import sharded_map_reads
    from muchsalsa_tpu.pipeline.mapper import MinimizerIndex
    from muchsalsa_tpu.testing.simulate import add_noise, simulate
    from muchsalsa_tpu.utils.seq import encode_2bit

    rng = np.random.default_rng(77)
    sim = simulate(rng, genome_length=16_000, coverage=4.0, read_length=3_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)

    seqs = [add_noise(rng, seq, 0.04) for _, seq in sim.read_records()][:16]
    L = max(len(s) for s in seqs)
    R = 16
    codes = np.full((R, L), 4, dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encode_2bit(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)

    index_arrays = (
        jnp.asarray(index.hashes),
        jnp.asarray(index.offsets.astype(np.int32)),
        jnp.asarray(index.entry_unitig),
        jnp.asarray(index.entry_pos),
        jnp.asarray(index.entry_strand),
    )
    caps = dict(k=cfg.k, w=cfg.w, bandwidth=cfg.bandwidth,
                min_anchor_count=cfg.min_anchor_count,
                min_chain_score=cfg.min_chain_score,
                max_pos=1024, max_per_hit=2)

    mesh = Mesh(np.array(jax.devices()[:8]), ("reads",))
    out_sh, stats = sharded_map_reads(
        jnp.asarray(codes), jnp.asarray(lens), index_arrays, mesh, **caps)
    out_1 = map_reads_device(jnp.asarray(codes), jnp.asarray(lens),
                             *index_arrays, **caps)

    for key in ("unitig", "strand", "qs", "qe", "ts", "te", "matches",
                "n_anchors", "n_hits"):
        np.testing.assert_array_equal(np.asarray(out_sh[key]), np.asarray(out_1[key]))
    assert float(stats[1]) == float(np.asarray(out_1["n_hits"]).sum())
