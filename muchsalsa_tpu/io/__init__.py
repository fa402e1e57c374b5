from muchsalsa_tpu.io.registry import Registry
from muchsalsa_tpu.io.fasta import SequenceStore
from muchsalsa_tpu.io.paf import PafRecords, read_paf
from muchsalsa_tpu.io.output import OutputWriter

__all__ = ["Registry", "SequenceStore", "PafRecords", "read_paf", "OutputWriter"]
