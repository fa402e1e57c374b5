"""Device (XLA) full mapper vs the host map_read oracle."""

import numpy as np
import jax.numpy as jnp

from muchsalsa_tpu.config import MapperConfig
from muchsalsa_tpu.io.fasta import SequenceStore
from muchsalsa_tpu.ops.mapping_jax import map_reads_device
from muchsalsa_tpu.pipeline.mapper import MinimizerIndex, map_read
from muchsalsa_tpu.testing.simulate import add_noise, simulate
from muchsalsa_tpu.utils.seq import encode_2bit


def _pack_reads(seqs, L):
    R = len(seqs)
    codes = np.full((R, L), 4, dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encode_2bit(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return jnp.asarray(codes), jnp.asarray(lens)


def _device_map(index, reads, cfg, use_bitmap=False, **caps):
    seqs = [seq for _, seq in reads.items()]
    rids = [rid for rid, _ in reads.items()]
    L = max(len(s) for s in seqs)
    codes, lens = _pack_reads(seqs, L)
    bitmap = None
    if use_bitmap:
        from muchsalsa_tpu.ops.minimizer_jax import build_hash_bitmap

        bitmap = build_hash_bitmap(index.hashes)
    out = map_reads_device(
        codes, lens,
        jnp.asarray(index.hashes), jnp.asarray(index.offsets.astype(np.int32)),
        jnp.asarray(index.entry_unitig), jnp.asarray(index.entry_pos),
        jnp.asarray(index.entry_strand), bitmap,
        k=cfg.k, w=cfg.w, bandwidth=cfg.bandwidth,
        min_anchor_count=cfg.min_anchor_count,
        min_chain_score=cfg.min_chain_score,
        **caps,
    )
    return rids, {k: np.asarray(v) for k, v in out.items()}


def test_device_mapper_matches_host():
    rng = np.random.default_rng(42)
    sim = simulate(rng, genome_length=30_000, coverage=6.0, read_length=5_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.05))

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    rids, dev = _device_map(index, reads, cfg, max_pos=2048, max_per_hit=2)

    assert not dev["overflow"].any(), "test data exceeded anchor budget"
    for i, rid in enumerate(rids):
        host = map_read(index, reads.sequence(rid), cfg, use_native=False)
        n = int(dev["n_hits"][i])
        assert n == len(host), (i, n, len(host))
        for j, m in enumerate(host):
            assert dev["unitig"][i, j] == m.unitig
            assert bool(dev["strand"][i, j]) == m.strand
            assert dev["qs"][i, j] == m.q_start
            assert dev["qe"][i, j] == m.q_end
            assert dev["ts"][i, j] == m.t_start
            assert dev["te"][i, j] == m.t_end
            assert dev["matches"][i, j] == m.matches
            assert dev["n_anchors"][i, j] == m.n_anchors


def test_device_mapper_no_hits_and_empty():
    rng = np.random.default_rng(9)
    store = SequenceStore()
    from muchsalsa_tpu.testing.simulate import random_genome

    store.add("u0", random_genome(rng, 1500))
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    reads.add("r0", random_genome(np.random.default_rng(777), 3000))
    reads.add("r1", b"ACGT")  # shorter than k
    rids, dev = _device_map(index, reads, cfg)
    assert dev["n_hits"].tolist() == [0, 0]
    assert not dev["overflow"].any()


def test_device_mapper_overflow_flag():
    """A read hitting an ultra-repetitive minimizer beyond max_per_hit
    raises the overflow flag instead of silently truncating."""
    rng = np.random.default_rng(10)
    from muchsalsa_tpu.testing.simulate import random_genome

    unit = random_genome(rng, 400)
    store = SequenceStore()
    for i in range(6):  # same sequence 6x -> every minimizer has 6 entries
        store.add(f"u{i}", unit)
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    reads.add("r0", unit)
    _, dev = _device_map(index, reads, cfg, max_per_hit=4)
    assert dev["overflow"][0]
    _, dev = _device_map(index, reads, cfg, max_per_hit=8)
    assert not dev["overflow"][0]
    assert dev["n_hits"][0] == 6


def test_device_mapper_bitmap_prefilter_identical():
    rng = np.random.default_rng(43)
    sim = simulate(rng, genome_length=20_000, coverage=5.0, read_length=4_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.06))

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    caps = dict(max_pos=2048, max_per_hit=2)
    _, plain = _device_map(index, reads, cfg, use_bitmap=False, **caps)
    _, pre = _device_map(index, reads, cfg, use_bitmap=True, **caps)
    for key in plain:
        np.testing.assert_array_equal(plain[key], pre[key], err_msg=key)


def test_device_mapper_rank_join_identical():
    from muchsalsa_tpu.ops.mapping_jax import build_join_tables

    rng = np.random.default_rng(44)
    sim = simulate(rng, genome_length=20_000, coverage=5.0, read_length=4_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.06))

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    bitmap, rank, rounds = build_join_tables(index.hashes)

    seqs = [seq for _, seq in reads.items()]
    L = max(len(s) for s in seqs)
    codes, lens = _pack_reads(seqs, L)
    args = (codes, lens,
            jnp.asarray(index.hashes), jnp.asarray(index.offsets.astype(np.int32)),
            jnp.asarray(index.entry_unitig), jnp.asarray(index.entry_pos),
            jnp.asarray(index.entry_strand))
    kw = dict(k=cfg.k, w=cfg.w, bandwidth=cfg.bandwidth,
              min_anchor_count=cfg.min_anchor_count,
              min_chain_score=cfg.min_chain_score,
              max_pos=2048, max_per_hit=2)
    plain = map_reads_device(*args, bitmap, **kw)
    fast = map_reads_device(*args, bitmap, rank, join_rounds=rounds, **kw)
    for key in plain:
        np.testing.assert_array_equal(
            np.asarray(plain[key]), np.asarray(fast[key]), err_msg=key)


def test_map_all_device_matches_host():
    from muchsalsa_tpu.pipeline.mapper import map_all

    rng = np.random.default_rng(45)
    sim = simulate(rng, genome_length=25_000, coverage=5.0, read_length=4_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.06))
    reads.add("tiny", b"ACGTAC")  # shorter than k

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    host_lines = map_all(index, reads, cfg)
    dev_lines = map_all(index, reads, cfg, device=True)
    assert dev_lines == host_lines


def test_device_mapper_random_adversarial():
    """Random reads + planted repeats: device output equals host map_read
    for every non-overflow read, overflow reads are flagged."""
    from muchsalsa_tpu.testing.simulate import random_genome

    rng = np.random.default_rng(46)
    store = SequenceStore()
    rep = random_genome(rng, 250)
    for i in range(30):
        g = random_genome(rng, int(rng.integers(300, 900)))
        if i % 3 == 0:
            g = g[:100] + rep + g[100:]  # planted repeat
        store.add(f"u{i}", g)
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    for i in range(20):
        src = int(rng.integers(0, 30))
        seq = store.sequence(src)
        s = int(rng.integers(0, max(1, len(seq) - 200)))
        reads.add(f"r{i}", seq[s : s + int(rng.integers(150, 400))])
    reads.add("rep_read", rep + rep)  # hits the repeat everywhere

    rids, dev = _device_map(index, reads, cfg, use_bitmap=True,
                            max_pos=512, max_per_hit=4)
    for i, rid in enumerate(rids):
        if dev["overflow"][i]:
            continue
        host = map_read(index, reads.sequence(rid), cfg, use_native=False)
        assert int(dev["n_hits"][i]) == len(host), rid
        for j, m in enumerate(host):
            assert dev["matches"][i, j] == m.matches


def test_map_all_with_device_counts_overflow():
    """Repeat-heavy fixture: reads over a tandem repeat exceed the
    max_per_hit budget, fall back to the exact host mapper, and the
    fallback COUNT is recorded in DEVICE_MAP_STATS (VERDICT r3: a
    device run must not silently become a host run)."""
    from muchsalsa_tpu.pipeline.mapper import (
        DEVICE_MAP_STATS, map_all_with_device, map_read)
    from muchsalsa_tpu.testing.simulate import random_genome

    rng = np.random.default_rng(48)
    rep = random_genome(rng, 400)
    store = SequenceStore()
    # the same repeat in many unitigs -> its minimizers have one index
    # entry per unitig, far beyond max_per_hit=2
    for i in range(8):
        g = random_genome(rng, 600)
        store.add(f"u{i}", g[:200] + rep + g[200:])
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    for i in range(4):
        reads.add(f"rep{i}", rep)               # all-repeat: must overflow
    reads.add("uniq", store.sequence(0)[:180])  # unique prefix: device-mappable

    out = map_all_with_device(index, reads, cfg, max_pos=256, max_per_hit=2)
    assert DEVICE_MAP_STATS["total_reads"] == 5
    assert DEVICE_MAP_STATS["overflow_reads"] >= 4
    # fallback preserved exactness
    for rid, maps in out:
        assert maps == map_read(index, reads.sequence(rid), cfg)


def test_map_all_with_device_dense_budget_repull(monkeypatch):
    """A batch whose hits exceed the dense d2h budget must re-pull via
    the padded tail with identical results (and count the re-pull).
    Pinned to one device: the meshed path uses the padded tail."""
    import jax

    from muchsalsa_tpu.pipeline.mapper import (
        DEVICE_MAP_STATS, map_all_with_device)
    from muchsalsa_tpu.testing.simulate import random_genome

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    rng = np.random.default_rng(49)
    store = SequenceStore()
    for i in range(12):
        store.add(f"u{i}", random_genome(rng, 700))
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    for i in range(12):
        reads.add(f"r{i}", store.sequence(i)[50:650])

    roomy = map_all_with_device(index, reads, cfg, max_pos=256,
                                max_per_hit=4)
    assert DEVICE_MAP_STATS["dense_repulls"] == 0
    tight = map_all_with_device(index, reads, cfg, max_pos=256,
                                max_per_hit=4, hit_budget=2)
    assert DEVICE_MAP_STATS["dense_repulls"] >= 1
    assert tight == roomy


def test_map_all_with_device_tier2_rescues_repeat_reads(monkeypatch):
    """Reads whose ONLY budget violation is a 5..16-entry minimizer
    must be recovered by the tier-2 (wider max_per_hit) device pass —
    not the host fallback — with identical results (round 5: on
    repeat-rich genomes the any-hot-minimizer amplification made
    overflow ~100% at cap 4).  Pinned to one device: the meshed path
    has no tier executables."""
    import jax

    from muchsalsa_tpu.pipeline.mapper import (
        DEVICE_MAP_STATS, map_all_with_device, map_read)
    from muchsalsa_tpu.testing.simulate import random_genome

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    rng = np.random.default_rng(48)
    rep = random_genome(rng, 300)
    store = SequenceStore()
    for i in range(6):  # 6 entries per repeat minimizer: cap 2 < 6 <= 16
        g = random_genome(rng, 600)
        store.add(f"u{i}", g[:200] + rep + g[200:])
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    for i in range(4):
        reads.add(f"rep{i}", rep)
    reads.add("uniq", store.sequence(0)[:180])

    out = map_all_with_device(index, reads, cfg, max_pos=1024, max_per_hit=2)
    assert DEVICE_MAP_STATS["tier2_reads"] >= 4
    assert DEVICE_MAP_STATS["overflow_reads"] == 0
    for rid, maps in out:
        assert maps == map_read(index, reads.sequence(rid), cfg)

    # with tier 2 disabled the same reads fall back to the host
    monkeypatch.setenv("MS_TPU_MAP_TIER2", "0")
    out2 = map_all_with_device(index, reads, cfg, max_pos=1024, max_per_hit=2)
    assert DEVICE_MAP_STATS["overflow_reads"] >= 4
    assert out2 == out


def test_tier2_batches_not_cached_across_indexes(monkeypatch):
    """Mapping the SAME store against two different indexes whose
    tier-2 (overflow) read sets differ must not alias stale packed
    tier-2 batches — a positional cache key would zip the first call's
    reads onto the second call's rids (round-5 review finding)."""
    import jax

    from muchsalsa_tpu.pipeline.mapper import (
        map_all_with_device, map_read)
    from muchsalsa_tpu.testing.simulate import random_genome

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    rng = np.random.default_rng(51)
    repA, repB = random_genome(rng, 300), random_genome(rng, 300)
    storeA, storeB = SequenceStore(), SequenceStore()
    for i in range(6):
        g = random_genome(rng, 600)
        storeA.add(f"a{i}", g[:200] + repA + g[200:])
        g2 = random_genome(rng, 600)
        storeB.add(f"b{i}", g2[:200] + repB + g2[200:])
    cfg = MapperConfig()
    idxA = MinimizerIndex.build(storeA, cfg)
    idxB = MinimizerIndex.build(storeB, cfg)

    reads = SequenceStore()
    reads.add("rA", repA)   # overflows (tiers) only vs index A
    reads.add("rB", repB)   # overflows (tiers) only vs index B
    reads.add("u", storeA.sequence(0)[:180])

    outA = map_all_with_device(idxA, reads, cfg, max_pos=1024, max_per_hit=2)
    outB = map_all_with_device(idxB, reads, cfg, max_pos=1024, max_per_hit=2)
    for rid, maps in outA:
        assert maps == map_read(idxA, reads.sequence(rid), cfg)
    for rid, maps in outB:
        assert maps == map_read(idxB, reads.sequence(rid), cfg)


def test_map_all_with_device_empty():
    from muchsalsa_tpu.pipeline.mapper import map_all_with_device

    store = SequenceStore()
    from muchsalsa_tpu.testing.simulate import random_genome

    store.add("u0", random_genome(np.random.default_rng(1), 800))
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)
    assert map_all_with_device(index, SequenceStore(), cfg) == []


def _device_map_v2(index, reads, cfg, **caps):
    from muchsalsa_tpu.ops.mapping_jax import build_device_tables, map_reads_device_v2

    seqs = [seq for _, seq in reads.items()]
    rids = [rid for rid, _ in reads.items()]
    L = max(len(s) for s in seqs)
    codes, lens = _pack_reads(seqs, L)
    built = build_device_tables(
        index.hashes, index.offsets, index.entry_unitig, index.entry_pos,
        index.entry_strand)
    assert built is not None
    tables, hash_takes = built
    out = map_reads_device_v2(
        codes, lens, tables.rp, tables.jrows, tables.erows,
        k=cfg.k, w=cfg.w, bandwidth=cfg.bandwidth,
        min_anchor_count=cfg.min_anchor_count,
        min_chain_score=cfg.min_chain_score, hash_takes=hash_takes,
        **caps,
    )
    return rids, {k: np.asarray(v) for k, v in out.items()}


def test_device_mapper_v2_matches_host():
    rng = np.random.default_rng(42)
    sim = simulate(rng, genome_length=30_000, coverage=6.0, read_length=5_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.05))

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    rids, dev = _device_map_v2(index, reads, cfg, max_pos=2048, max_per_hit=2)

    assert not dev["overflow"].any(), "test data exceeded anchor budget"
    for i, rid in enumerate(rids):
        host = map_read(index, reads.sequence(rid), cfg, use_native=False)
        n = int(dev["n_hits"][i])
        assert n == len(host), (i, n, len(host))
        for j, m in enumerate(host):
            assert dev["unitig"][i, j] == m.unitig
            assert bool(dev["strand"][i, j]) == m.strand
            assert dev["qs"][i, j] == m.q_start
            assert dev["qe"][i, j] == m.q_end
            assert dev["ts"][i, j] == m.t_start
            assert dev["te"][i, j] == m.t_end
            assert dev["matches"][i, j] == m.matches
            assert dev["n_anchors"][i, j] == m.n_anchors


def test_device_mapper_v2_overflow_flag():
    rng = np.random.default_rng(10)
    from muchsalsa_tpu.testing.simulate import random_genome

    unit = random_genome(rng, 400)
    store = SequenceStore()
    for i in range(6):  # same sequence 6x -> every minimizer has 6 entries
        store.add(f"u{i}", unit)
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    reads.add("r0", unit)
    _, dev = _device_map_v2(index, reads, cfg, max_per_hit=4)
    assert dev["overflow"][0]
    _, dev = _device_map_v2(index, reads, cfg, max_per_hit=8)
    assert not dev["overflow"][0]
    assert dev["n_hits"][0] == 6


def test_device_mapper_v2_random_adversarial():
    from muchsalsa_tpu.testing.simulate import random_genome

    rng = np.random.default_rng(46)
    store = SequenceStore()
    rep = random_genome(rng, 250)
    for i in range(30):
        g = random_genome(rng, int(rng.integers(300, 900)))
        if i % 3 == 0:
            g = g[:100] + rep + g[100:]  # planted repeat
        store.add(f"u{i}", g)
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)

    reads = SequenceStore()
    for i in range(20):
        src = int(rng.integers(0, 30))
        seq = store.sequence(src)
        s = int(rng.integers(0, max(1, len(seq) - 200)))
        reads.add(f"r{i}", seq[s : s + int(rng.integers(150, 400))])
    reads.add("rep_read", rep + rep)  # hits the repeat everywhere

    rids, dev = _device_map_v2(index, reads, cfg, max_pos=512, max_per_hit=4)
    for i, rid in enumerate(rids):
        if dev["overflow"][i]:
            continue
        host = map_read(index, reads.sequence(rid), cfg, use_native=False)
        assert int(dev["n_hits"][i]) == len(host), rid
        for j, m in enumerate(host):
            assert dev["matches"][i, j] == m.matches


def test_device_mapper_v2_matches_v1():
    """v1 (bitmap + binary search) and v2 (packed rows) agree on hits
    for every read neither flags as overflow."""
    rng = np.random.default_rng(47)
    sim = simulate(rng, genome_length=20_000, coverage=5.0, read_length=4_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.06))

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    caps = dict(max_pos=2048, max_per_hit=2)
    _, v1 = _device_map(index, reads, cfg, use_bitmap=True, **caps)
    _, v2 = _device_map_v2(index, reads, cfg, **caps)
    for key in ("unitig", "strand", "qs", "qe", "ts", "te", "matches",
                "n_anchors", "n_hits"):
        np.testing.assert_array_equal(v1[key], v2[key], err_msg=key)


def test_pack_codes_roundtrip():
    """2-bit tunnel pack: bit-exact round trip for codes in {0..4} with
    padded tails, plus the shape guards (ADVICE r2)."""
    import pytest

    from muchsalsa_tpu.ops.mapping_jax import pack_codes, unpack_codes

    rng = np.random.default_rng(48)
    R, L = 7, 1024
    codes = np.full((R, L), 4, dtype=np.uint8)
    for i in range(R):
        n = int(rng.integers(1, L))
        codes[i, :n] = rng.integers(0, 5, n)  # includes in-read N (=4)
    packed, nmask = pack_codes(codes)
    out = np.asarray(unpack_codes(jnp.asarray(packed), jnp.asarray(nmask)))
    np.testing.assert_array_equal(out, codes)

    with pytest.raises(ValueError):
        pack_codes(codes[:, : L - 8])  # L % 32 != 0
    with pytest.raises(ValueError):
        unpack_codes(jnp.asarray(packed), jnp.asarray(nmask[:, :-1]))


def test_device_mapper_v2_packed_matches_unpacked():
    """map_reads_device_v2_packed == map_reads_device_v2 on a real batch."""
    from muchsalsa_tpu.ops.mapping_jax import (
        build_device_tables, map_reads_device_v2, map_reads_device_v2_packed,
        pack_codes)

    rng = np.random.default_rng(49)
    sim = simulate(rng, genome_length=20_000, coverage=4.0, read_length=3_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    seqs = [add_noise(rng, seq, 0.05) for _, seq in sim.read_records()]

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    tables, hash_takes = build_device_tables(
        index.hashes, index.offsets, index.entry_unitig, index.entry_pos,
        index.entry_strand)
    L = 4096
    codes, lens = _pack_reads(seqs, L)
    kw = dict(k=cfg.k, w=cfg.w, bandwidth=cfg.bandwidth,
              min_anchor_count=cfg.min_anchor_count,
              min_chain_score=cfg.min_chain_score,
              hash_takes=hash_takes, max_pos=1024, max_per_hit=4)
    ref = map_reads_device_v2(
        codes, lens, tables.rp, tables.jrows, tables.erows, **kw)
    packed, nmask = pack_codes(np.asarray(codes))
    out = map_reads_device_v2_packed(
        jnp.asarray(packed), jnp.asarray(nmask), lens,
        tables.rp, tables.jrows, tables.erows, **kw)
    for key in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[key]), np.asarray(out[key]), err_msg=key)


def test_map_all_with_device_meshes_nondivisible(monkeypatch):
    """3 attached devices with a non-divisible batch: the batch pads up
    and the meshed path still engages (no silent single-device fallback,
    VERDICT r2 item 9), output equal to the host mapper."""
    import jax

    from muchsalsa_tpu.pipeline import mapper as mapper_mod
    from muchsalsa_tpu.pipeline.mapper import DEVICE_MAP_STATS, map_all

    real_devices = jax.devices()
    assert len(real_devices) >= 3
    monkeypatch.setattr(
        mapper_mod.jax if hasattr(mapper_mod, "jax") else jax, "devices",
        lambda *a, **k: real_devices[:3])

    rng = np.random.default_rng(50)
    sim = simulate(rng, genome_length=15_000, coverage=4.0, read_length=2_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.05))
    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)

    host = map_all(index, reads, cfg)
    dev = map_all(index, reads, cfg, device=True)
    assert dev == host
    assert DEVICE_MAP_STATS["meshed"] is True
    assert DEVICE_MAP_STATS["n_devices"] == 3
    assert DEVICE_MAP_STATS["batch_reads"] % 3 == 0


def test_split_pipeline_matches_fused():
    """The production two-jit pipeline (anchors | chaining tail) equals
    the fused map_reads_device_v2_packed jit bit-for-bit."""
    from muchsalsa_tpu.ops.mapping_jax import (
        anchors_to_hits_device, build_device_tables,
        map_anchors_device_v2_packed, map_reads_device_v2_packed,
        pack_codes)

    rng = np.random.default_rng(48)
    sim = simulate(rng, genome_length=24_000, coverage=5.0, read_length=4_000)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.05))

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    tables, hash_takes = build_device_tables(
        index.hashes, index.offsets, index.entry_unitig, index.entry_pos,
        index.entry_strand)

    seqs = [seq for _, seq in reads.items()]
    L = 1 << int(max(len(s) for s in seqs) - 1).bit_length()
    codes = np.full((len(seqs), L), 4, dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encode_2bit(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    packed, nmask = pack_codes(codes)
    args = (jnp.asarray(packed), jnp.asarray(nmask), jnp.asarray(lens),
            tables.rp, tables.jrows, tables.erows)

    for max_pos, A in ((512, 4), (1024, 2)):
        fused = map_reads_device_v2_packed(
            *args, k=cfg.k, w=cfg.w, bandwidth=cfg.bandwidth,
            min_anchor_count=cfg.min_anchor_count,
            min_chain_score=cfg.min_chain_score,
            max_pos=max_pos, max_per_hit=A, hash_takes=hash_takes)
        anchors = map_anchors_device_v2_packed(
            *args, k=cfg.k, w=cfg.w, max_pos=max_pos, max_per_hit=A,
            hash_takes=hash_takes)
        split = anchors_to_hits_device(
            *anchors, k=cfg.k, bandwidth=cfg.bandwidth,
            min_anchor_count=cfg.min_anchor_count,
            min_chain_score=cfg.min_chain_score, per_hit_cap=A)
        for key in fused:
            np.testing.assert_array_equal(
                np.asarray(fused[key]), np.asarray(split[key]),
                err_msg=f"{key} max_pos={max_pos} A={A}")


def test_tier2_env_clamped_to_saturation_bound(monkeypatch):
    """MS_TPU_MAP_TIER2 above the v2 count-saturation bound (31) must
    clamp, not crash the mapping pass (round-5 review finding)."""
    import jax

    from muchsalsa_tpu.pipeline.mapper import map_all_with_device, map_read
    from muchsalsa_tpu.testing.simulate import random_genome

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])
    monkeypatch.setenv("MS_TPU_MAP_TIER2", "64")

    rng = np.random.default_rng(52)
    rep = random_genome(rng, 300)
    store = SequenceStore()
    for i in range(6):
        g = random_genome(rng, 600)
        store.add(f"u{i}", g[:200] + rep + g[200:])
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)
    reads = SequenceStore()
    reads.add("r0", rep)
    out = map_all_with_device(index, reads, cfg, max_pos=1024, max_per_hit=2)
    assert out[0][1] == map_read(index, rep, cfg)


def test_device_map_stats_cum_accumulates(monkeypatch):
    """DEVICE_MAP_STATS resets per call; the cumulative dict must sum
    across calls (multi-call measurements like the chunked ava)."""
    import jax

    from muchsalsa_tpu.pipeline.mapper import (
        DEVICE_MAP_STATS_CUM, map_all_with_device)
    from muchsalsa_tpu.testing.simulate import random_genome

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])

    rng = np.random.default_rng(53)
    store = SequenceStore()
    for i in range(4):
        store.add(f"u{i}", random_genome(rng, 900))
    cfg = MapperConfig()
    index = MinimizerIndex.build(store, cfg)
    reads = SequenceStore()
    for i in range(3):
        reads.add(f"r{i}", store.sequence(i)[50:850])

    DEVICE_MAP_STATS_CUM.clear()
    map_all_with_device(index, reads, cfg)
    map_all_with_device(index, reads, cfg)
    assert DEVICE_MAP_STATS_CUM["total_reads"] == 6
