from muchsalsa_tpu.matching.store import MatchStore, EdgeMatches
from muchsalsa_tpu.matching.edges import build_edges

__all__ = ["MatchStore", "EdgeMatches", "build_edges"]
