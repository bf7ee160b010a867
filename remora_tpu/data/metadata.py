"""Dataset metadata: schema + chunk-extraction hyperparameters.

Reference analog ``DatasetMetadata`` (``src/remora/data_chunks.py:645–
888``). The on-disk representation (``metadata.jsn`` + ``kmer_table.npy``
sidecar) is kept byte-level compatible with reference dataset version 3
so datasets interoperate in both directions; dataclass field names double
as the JSON key contract.
"""

import dataclasses
import json
import os
from copy import deepcopy
from typing import Optional

import numpy as np

from remora_tpu import RemoraError, constants
from remora_tpu.core.seq import Motif
from remora_tpu.refine.refiner import SigMapRefiner

DATASET_VERSION = constants.DATASET_VERSION

# numpy scalar/array -> plain JSON value
_JSON_COERCIONS = (
    (np.integer, int),
    (np.floating, float),
    (np.bool_, bool),
    (np.ndarray, lambda a: a.tolist()),
)


def jsonify_numpy(obj):
    """``json.dump`` default hook handling numpy scalars and arrays."""
    for np_type, coerce in _JSON_COERCIONS:
        if isinstance(obj, np_type):
            return coerce(obj)
    raise TypeError(f"Object of type {type(obj)} is not JSON serializable")


@dataclasses.dataclass
class DatasetMetadata:
    """Travels with data and model so inference extracts chunks exactly
    as data preparation did."""

    # dataset attributes
    allocate_size: int
    max_seq_len: int
    # labels
    mod_bases: list
    mod_long_names: list
    # chunk extract
    motif_sequences: list
    motif_offsets: list

    dataset_start: int = 0
    dataset_end: int = 0
    version: int = DATASET_VERSION
    modified_base_labels: bool = True
    extra_arrays: Optional[dict] = None
    chunk_context: tuple = constants.DEFAULT_CHUNK_CONTEXT
    base_start_justify: bool = False
    offset: int = 0
    kmer_context_bases: tuple = constants.DEFAULT_KMER_CONTEXT_BASES
    reverse_signal: bool = False
    pa_scaling: Optional[tuple] = None
    sig_map_refiner: Optional[SigMapRefiner] = None
    rough_rescale_method: str = constants.DEFAULT_ROUGH_RESCALE_METHOD

    _stored_kmer_context_bases: Optional[tuple] = None
    _stored_chunk_context: Optional[tuple] = None

    def __post_init__(self):
        # accept "mh"-style strings, single-letter lists, or ChEBI int lists
        self.mod_bases = [str(code) for code in self.mod_bases]
        if len(self.mod_bases) != len(self.mod_long_names):
            raise AssertionError(
                f"mod_bases ({self.mod_bases}) and mod_long_names "
                f"({self.mod_long_names}) must pair up"
            )
        for attr in ("mod_long_names", "motif_sequences", "motif_offsets"):
            setattr(self, attr, list(getattr(self, attr)))
        for attr in ("chunk_context", "kmer_context_bases"):
            setattr(self, attr, tuple(getattr(self, attr)))
        for attr in ("_stored_chunk_context", "_stored_kmer_context_bases",
                     "pa_scaling"):
            val = getattr(self, attr)
            if val is not None:
                setattr(self, attr, tuple(val))
        self.check_motifs()

    # --- context windows (requested vs stored-on-disk) ---
    @property
    def stored_chunk_context(self):
        return self._stored_chunk_context or self.chunk_context

    @property
    def chunk_context_adjusted(self):
        return self.chunk_context != self.stored_chunk_context

    @property
    def chunk_width(self):
        before, after = self.chunk_context
        return before + after

    @property
    def stored_chunk_width(self):
        before, after = self.stored_chunk_context
        return before + after

    @property
    def stored_kmer_context_bases(self):
        return self._stored_kmer_context_bases or self.kmer_context_bases

    @property
    def kmer_context_bases_adjusted(self):
        return self.kmer_context_bases != self.stored_kmer_context_bases

    @property
    def kmer_len(self):
        before, after = self.kmer_context_bases
        return before + after + 1

    # --- labels / motifs ---
    @property
    def labels(self):
        return ["control", *self.mod_long_names]

    @property
    def num_labels(self):
        return 1 + len(self.mod_long_names)

    @property
    def motifs(self):
        return [*zip(self.motif_sequences, self.motif_offsets)]

    @property
    def num_motifs(self):
        return len(self.motif_sequences)

    @property
    def size(self):
        return self.dataset_end - self.dataset_start

    def check_motifs(self):
        motifs = [Motif(*mot) for mot in self.motifs]
        ambig = [m for m in motifs if m.focus_base not in "ACGT"]
        if ambig:
            raise RemoraError(
                f"Dataset motifs need unambiguous focus bases; got {ambig}"
            )
        if len({m.focus_base for m in motifs}) > 1:
            raise RemoraError(
                "Dataset motifs must share a single focus base; got "
                f"{set(m.focus_base for m in motifs)}"
            )

    # --- core array geometry (v3 on-disk layout) ---
    # per-chunk widths of the ragged arrays
    @property
    def sequence_width(self):
        kb, ka = self.stored_kmer_context_bases
        return self.max_seq_len + kb + ka

    @property
    def sequence_to_signal_mapping_width(self):
        return self.max_seq_len + 1

    # full allocated array shapes, one per core on-disk array
    @property
    def sequence_lengths_shape(self):
        return (self.allocate_size,)

    labels_shape = sequence_lengths_shape
    extras_shape = sequence_lengths_shape

    @property
    def signal_shape(self):
        return (self.allocate_size, 1, self.stored_chunk_width)

    @property
    def sequence_shape(self):
        return (self.allocate_size, self.sequence_width)

    @property
    def sequence_to_signal_mapping_shape(self):
        return (self.allocate_size, self.sequence_to_signal_mapping_width)

    @property
    def extra_array_names(self):
        return list(self.extra_arrays) if self.extra_arrays else []

    @property
    def extra_array_dtypes_and_shapes(self):
        if not self.extra_arrays:
            return []
        return [
            (name, dtype, self.extras_shape)
            for name, (dtype, _desc) in self.extra_arrays.items()
        ]

    # --- (de)serialization ---
    def asdict(self):
        flat = dataclasses.asdict(self)
        flat.pop("sig_map_refiner")
        if self.sig_map_refiner is not None:
            flat.update(self.sig_map_refiner.asdict())
        return flat

    def copy(self):
        return deepcopy(self)

    def write(self, metadata_path, kmer_table_path=None):
        """Write metadata.jsn (levels go to the .npy sidecar)."""
        record = self.asdict()
        if record.get("refine_kmer_levels") is not None:
            # large level table goes to the .npy sidecar, not the JSON
            levels = record.pop("refine_kmer_levels")
            if kmer_table_path is not None:
                np.save(kmer_table_path, levels, allow_pickle=False)
        with open(metadata_path, "w") as fh:
            json.dump(record, fh, default=jsonify_numpy)

    @classmethod
    def load(cls, metadata_path, kmer_table_path=None):
        """Load metadata.jsn (+ optional kmer table sidecar) to a dict."""
        with open(metadata_path) as fh:
            record = json.load(fh)
        found_version = record.get("version")
        if found_version != DATASET_VERSION:
            raise RemoraError(
                f"Remora dataset version ({found_version}) does not "
                f"match current distribution ({DATASET_VERSION})"
            )
        if kmer_table_path is not None and os.path.exists(kmer_table_path):
            record["refine_kmer_levels"] = np.load(kmer_table_path)
        if record.get("refine_sd_arr") is not None:
            record["refine_sd_arr"] = np.asarray(
                record["refine_sd_arr"], np.float32
            )
        record["sig_map_refiner"] = SigMapRefiner.load_from_metadata(record)
        for key in [k for k in record if k.startswith("refine_")]:
            del record[key]
        return record
