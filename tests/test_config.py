import dataclasses

from muchsalsa_tpu.config import Config, DEFAULT_CONFIG


def test_config_json_roundtrip():
    cfg = DEFAULT_CONFIG
    text = cfg.to_json()
    back = Config.from_json(text)
    assert back == cfg


def test_config_roundtrip_with_overrides(tmp_path):
    graph = dataclasses.replace(DEFAULT_CONFIG.graph, wiggle_room=150, min_matches=200)
    device = dataclasses.replace(DEFAULT_CONFIG.device, chain_buckets=(4, 8), use_device=False)
    cfg = dataclasses.replace(DEFAULT_CONFIG, graph=graph, device=device)
    p = tmp_path / "cfg.json"
    cfg.save(p)
    back = Config.load(p)
    assert back.graph.wiggle_room == 150
    assert back.device.chain_buckets == (4, 8)
    assert not back.device.use_device
    assert back == cfg


def test_reference_constants_preserved():
    """The defaults must stay the reference's compile-time constants."""
    g = DEFAULT_CONFIG.graph
    assert (g.min_matches, g.th_length, g.th_matches) == (400, 500, 500)
    assert g.th_overlap == 100
    assert g.wiggle_room == 300
    assert (g.base_weight_multiplicator, g.max_weight_multiplicator) == (1.1, 0.8)
    li = DEFAULT_CONFIG.linearize
    assert li.cluster_weight_exact_max_order == 150_000
    assert (li.path_min_length, li.path_min_length_touching, li.join_max_distance) == (10, 5, 3)
    c = DEFAULT_CONFIG.consensus
    assert (c.th_sequence_length, c.sequence_line_length) == (200, 60)
    s = DEFAULT_CONFIG.scrub
    assert (s.subset_size, s.min_hit_length, s.end_trim) == (60_000, 500, 200)
    m = DEFAULT_CONFIG.mapper
    assert (m.k, m.w, m.min_chain_score) == (15, 5, 100)
