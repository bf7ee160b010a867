"""Dataset metadata: schema + chunk-extraction hyperparameters.

Reference analog ``DatasetMetadata`` (``src/remora/data_chunks.py:645–
888``). The on-disk representation (``metadata.jsn`` + ``kmer_table.npy``
sidecar) is kept byte-level compatible with reference dataset version 3
so datasets interoperate in both directions.
"""

import dataclasses
import json
from copy import deepcopy

import numpy as np

from remora_tpu import RemoraError, constants
from remora_tpu.core.seq import Motif
from remora_tpu.refine.refiner import SigMapRefiner

DATASET_VERSION = constants.DATASET_VERSION


class NpEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


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
    extra_arrays: dict = None
    chunk_context: tuple = constants.DEFAULT_CHUNK_CONTEXT
    base_start_justify: bool = False
    offset: int = 0
    kmer_context_bases: tuple = constants.DEFAULT_KMER_CONTEXT_BASES
    reverse_signal: bool = False
    pa_scaling: tuple = None
    sig_map_refiner: SigMapRefiner = None
    rough_rescale_method: str = constants.DEFAULT_ROUGH_RESCALE_METHOD

    _stored_kmer_context_bases: tuple = None
    _stored_chunk_context: tuple = None

    @property
    def chunk_width(self):
        return sum(self.chunk_context)

    @property
    def stored_chunk_context(self):
        if self._stored_chunk_context is None:
            return self.chunk_context
        return self._stored_chunk_context

    @property
    def stored_chunk_width(self):
        return sum(self.stored_chunk_context)

    @property
    def chunk_context_adjusted(self):
        return self.stored_chunk_context != self.chunk_context

    @property
    def kmer_len(self):
        return sum(self.kmer_context_bases) + 1

    @property
    def stored_kmer_context_bases(self):
        if self._stored_kmer_context_bases is None:
            return self.kmer_context_bases
        return self._stored_kmer_context_bases

    @property
    def kmer_context_bases_adjusted(self):
        return self.stored_kmer_context_bases != self.kmer_context_bases

    @property
    def size(self):
        return self.dataset_end - self.dataset_start

    @property
    def labels(self):
        return ["control"] + list(self.mod_long_names)

    @property
    def num_labels(self):
        return len(self.mod_long_names) + 1

    @property
    def motifs(self):
        return list(zip(self.motif_sequences, self.motif_offsets))

    @property
    def num_motifs(self):
        return len(self.motif_sequences)

    @property
    def extra_array_names(self):
        return [] if self.extra_arrays is None else list(self.extra_arrays.keys())

    @property
    def extra_array_dtypes_and_shapes(self):
        if self.extra_arrays is None:
            return []
        return [
            (name, dtype, self.extras_shape)
            for name, (dtype, _desc) in self.extra_arrays.items()
        ]

    @property
    def signal_shape(self):
        return self.allocate_size, 1, self.stored_chunk_width

    @property
    def sequence_width(self):
        return self.max_seq_len + sum(self.stored_kmer_context_bases)

    @property
    def sequence_shape(self):
        return self.allocate_size, self.sequence_width

    @property
    def sequence_to_signal_mapping_width(self):
        return self.max_seq_len + 1

    @property
    def sequence_to_signal_mapping_shape(self):
        return self.allocate_size, self.sequence_to_signal_mapping_width

    @property
    def sequence_lengths_shape(self):
        return (self.allocate_size,)

    @property
    def labels_shape(self):
        return (self.allocate_size,)

    @property
    def extras_shape(self):
        return (self.allocate_size,)

    def check_motifs(self):
        motifs = [Motif(*mot) for mot in self.motifs]
        ambig = [m for m in motifs if m.focus_base not in "ACGT"]
        if ambig:
            raise RemoraError(
                f"Cannot create dataset at motifs with ambiguous bases {ambig}"
            )
        focus_bases = set(m.focus_base for m in motifs)
        if len(focus_bases) > 1:
            raise RemoraError(
                f"Cannot create dataset with multiple motif focus bases: "
                f"{focus_bases}"
            )

    def __post_init__(self):
        if isinstance(self.mod_bases, str):
            self.mod_bases = list(self.mod_bases)
        self.mod_bases = list(map(str, self.mod_bases))
        assert len(self.mod_bases) == len(self.mod_long_names), (
            f"mod_bases ({self.mod_bases}) must be the same length as "
            f"mod_long_names ({self.mod_long_names})"
        )
        self.mod_long_names = list(self.mod_long_names)
        self.motif_sequences = list(self.motif_sequences)
        self.motif_offsets = list(self.motif_offsets)
        self.chunk_context = tuple(self.chunk_context)
        self.kmer_context_bases = tuple(self.kmer_context_bases)
        if self._stored_chunk_context is not None:
            self._stored_chunk_context = tuple(self._stored_chunk_context)
        if self._stored_kmer_context_bases is not None:
            self._stored_kmer_context_bases = tuple(
                self._stored_kmer_context_bases
            )
        if self.pa_scaling is not None:
            self.pa_scaling = tuple(self.pa_scaling)
        self.check_motifs()

    def asdict(self):
        r_dict = dataclasses.asdict(self)
        del r_dict["sig_map_refiner"]
        if self.sig_map_refiner is not None:
            r_dict.update(self.sig_map_refiner.asdict())
        return r_dict

    def copy(self):
        return deepcopy(self)

    def write(self, metadata_path, kmer_table_path=None):
        self_dict = self.asdict()
        if self_dict.get("refine_kmer_levels") is not None:
            if kmer_table_path is not None:
                np.save(
                    kmer_table_path,
                    self_dict["refine_kmer_levels"],
                    allow_pickle=False,
                )
            del self_dict["refine_kmer_levels"]
        with open(metadata_path, "w") as fh:
            json.dump(self_dict, fh, cls=NpEncoder)

    @classmethod
    def load(cls, metadata_path, kmer_table_path=None):
        """Load metadata.jsn (+ optional kmer table sidecar)."""
        import os

        with open(metadata_path) as fh:
            loaded = json.load(fh)
        if loaded.get("version") != DATASET_VERSION:
            raise RemoraError(
                f"Remora dataset version ({loaded.get('version')}) does not "
                f"match current distribution ({DATASET_VERSION})"
            )
        if kmer_table_path is not None and os.path.exists(kmer_table_path):
            loaded["refine_kmer_levels"] = np.load(kmer_table_path)
        if loaded.get("refine_sd_arr") is not None:
            loaded["refine_sd_arr"] = np.asarray(
                loaded["refine_sd_arr"], np.float32
            )
        loaded["sig_map_refiner"] = SigMapRefiner.load_from_metadata(loaded)
        for key in [k for k in loaded if k.startswith("refine_")]:
            del loaded[key]
        return loaded
