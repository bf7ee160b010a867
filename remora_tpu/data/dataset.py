"""Chunk datasets: single memory-mapped store + weighted composition.

Reference analogs: ``CoreRemoraDataset`` (``src/remora/data_chunks.py:
926–1702``) and ``RemoraDataset`` (``:1806–2276``). The on-disk layout is
kept bit-compatible with reference dataset v3: five headerless arrays
(``signal.npy`` f32 (N,1,W), ``sequence.npy`` i8, ``sequence_to_signal_
mapping.npy`` i16, ``sequence_lengths.npy`` i16, ``labels.npy`` i64 —
written via np.memmap, so despite the extension there is no npy header),
plus ``extra_*.npy`` and ``metadata.jsn`` (+ ``kmer_table.npy``).

Batches are plain dicts of NumPy arrays; the training loop moves them to
device and the encoded-kmer featurization runs on device (the host
fallback here is used for small/CPU paths).
"""

import hashlib
import json
import os
from dataclasses import dataclass
from glob import glob

import numpy as np

from remora_tpu import RemoraError, constants, log
from remora_tpu.core import seq as sequtil
from remora_tpu.core.util import resolve_path
from remora_tpu.data import encoded_kmers
from remora_tpu.data.metadata import DATASET_VERSION, DatasetMetadata

LOGGER = log.get_logger()


def check_super_batch(super_batch, chunk_width):
    """Sanity-check a loaded super batch (reference ``check_super_batch``)."""
    if not np.all(super_batch["sequence_lengths"]) > 0:
        raise RemoraError("Sequence lengths must all be positive.")
    sm_r = np.arange(super_batch["sequence_to_signal_mapping"].shape[1])
    sm_mask = sm_r < (super_batch["sequence_lengths"][:, None] + 1)
    sm_m = super_batch["sequence_to_signal_mapping"][sm_mask]
    if sm_m.max() > chunk_width:
        raise RemoraError("Signal mapping extend beyond chunk width")
    if sm_m.min() < 0:
        raise RemoraError("Signal mapping cannot contain negative values")
    chunks_r = np.arange(super_batch["sequence_lengths"].size)
    if not np.all(
        super_batch["sequence_to_signal_mapping"][
            chunks_r, super_batch["sequence_lengths"]
        ]
        == chunk_width
    ):
        raise RemoraError("Chunk does not end at chunk_width")
    seqlen_cs = np.cumsum(super_batch["sequence_lengths"])
    sm_diff_mask = np.ones(sm_m.size - 1, dtype=bool)
    sm_diff_mask[seqlen_cs[:-1] + np.arange(seqlen_cs.size)[:-1]] = 0
    if np.diff(sm_m)[sm_diff_mask].min() < 0:
        raise RemoraError("Sequence to signal mappings are not monotonic")
    seq_r = np.arange(super_batch["sequence"].shape[1])
    seq_mask = seq_r < super_batch["sequence_lengths"][:, None]
    seq_m = super_batch["sequence"][seq_mask]
    if seq_m.max() > 3:
        raise RemoraError("Sequence max must be less than 4")
    if seq_m.min() < -1:
        raise RemoraError("Sequence min must greater tha -2")


def trim_sb_chunk_context(stored_cc, cc, total_seq_context, seqs,
                          seq_mappings, seq_lens):
    """In-place ragged trim of seq + mapping rows for a smaller chunk
    context (reference Cython ``trim_sb_chunk_context_core``), vectorized.

    Assumes ``seq_mappings`` has already been shifted by the start diff.
    """
    new_width = cc[0] + cc[1]
    B = seq_lens.shape[0]
    Sp1 = seq_mappings.shape[1]
    s_idx = np.arange(Sp1)[None, :]
    valid = s_idx <= seq_lens[:, None]
    m = np.where(valid, seq_mappings, np.int32(1 << 30))
    # first base whose (shifted) end maps beyond 0 is the new first base
    ends_after_zero = (m[:, 1:] > 0) & valid[:, 1:]
    new_first = np.argmax(ends_after_zero, axis=1)  # base index
    # last base whose start is before new_width is the new last base
    starts_before_w = (m[:, :-1] < new_width) & valid[:, :-1]
    rev = starts_before_w[:, ::-1]
    new_last = Sp1 - 2 - np.argmax(rev, axis=1)
    new_lens = (new_last - new_first + 1).astype(seq_lens.dtype)

    for b in range(B):
        nf, nl = int(new_first[b]), int(new_last[b])
        sl = int(new_lens[b])
        if nf > 0:
            seq_mappings[b, : sl + 1] = seq_mappings[b, nf : nf + sl + 1]
            seqs[b, : sl + total_seq_context] = seqs[
                b, nf : nf + sl + total_seq_context
            ]
        seq_mappings[b, 0] = 0
        seq_mappings[b, sl] = new_width
        np.clip(
            seq_mappings[b, : sl + 1], 0, new_width,
            out=seq_mappings[b, : sl + 1],
        )
        seq_lens[b] = sl
    return seqs, seq_mappings, seq_lens


@dataclass
class CoreDataset:
    """One on-disk (or in-memory) chunk store with super-batch streaming."""

    data_path: str = None
    mode: str = "r"
    metadata: DatasetMetadata = None
    override_metadata: dict = None
    batch_size: int = constants.DEFAULT_BATCH_SIZE
    super_batch_size: int = constants.DEFAULT_SUPER_BATCH_SIZE
    super_batch_sample_frac: float = None
    super_batch_offset: int = 0
    infinite_iter: bool = True
    do_check_super_batches: bool = False

    _core_dtypes = {
        "signal": np.float32,
        "sequence": np.int8,
        "sequence_to_signal_mapping": np.int16,
        "sequence_lengths": np.int16,
        "labels": np.int64,
    }
    _core_arrays = list(_core_dtypes.keys())

    # ------------- paths / hashing -------------
    @staticmethod
    def dataset_paths(data_path):
        data_path = resolve_path(data_path)
        paths = [
            os.path.join(data_path, p)
            for p in ["metadata.jsn"]
            + [f"{n}.npy" for n in CoreDataset._core_arrays]
        ]
        paths.extend(sorted(glob(os.path.join(data_path, "extra_*.npy"))))
        if os.path.isfile(os.path.join(data_path, "kmer_table.npy")):
            paths.append(os.path.join(data_path, "kmer_table.npy"))
        return paths

    @staticmethod
    def check_dataset_dir(data_path):
        return all(
            os.path.isfile(p) for p in CoreDataset.dataset_paths(data_path)
        )

    @staticmethod
    def hash(data_path):
        """Sampled sha256 over dataset files (reference-compatible)."""

        def file_digest(fh, _bufsize=2**18, num_buf=8):
            digest = hashlib.sha256()
            buf = bytearray(_bufsize)
            view = memoryview(buf)
            file_size = fh.seek(0, os.SEEK_END)
            if file_size < _bufsize * num_buf:
                fh.seek(0)
                while True:
                    size = fh.readinto(buf)
                    if size == 0:
                        break
                    digest.update(view[:size])
            else:
                for f_pos in np.floor(
                    np.linspace(0, file_size - _bufsize, num_buf)
                ).astype(int):
                    fh.seek(f_pos)
                    fh.readinto(buf)
                    digest.update(view)
            return digest.hexdigest()

        files_hash = ""
        for arr_path in CoreDataset.dataset_paths(data_path):
            with open(arr_path, "rb") as fh:
                files_hash += file_digest(fh)
        return hashlib.sha256(files_hash.encode("utf-8")).hexdigest()

    @property
    def metadata_path(self):
        if self.data_path is None:
            raise RemoraError("No path available for in-memory dataset")
        return os.path.join(self.data_path, "metadata.jsn")

    @property
    def kmer_table_path(self):
        if self.data_path is None:
            raise RemoraError("No path available for in-memory dataset")
        return os.path.join(self.data_path, "kmer_table.npy")

    @property
    def size(self):
        return self.metadata.dataset_end - self.metadata.dataset_start

    @property
    def array_names(self):
        return self._core_arrays + self.metadata.extra_array_names

    @property
    def arrays_info(self):
        info = [
            (name, dtype, getattr(self.metadata, f"{name}_shape"))
            for name, dtype in self._core_dtypes.items()
        ]
        info.extend(self.metadata.extra_array_dtypes_and_shapes)
        return info

    @property
    def summary(self):
        return (
            f"                data_path : {self.data_path}\n"
            f"                     size : {self.size:,}\n"
            f"            dataset_start : {self.metadata.dataset_start:,}\n"
            f"              dataset_end : {self.metadata.dataset_end:,}\n"
            f"       label distribution : {self.label_summary}\n"
            f"     modified_base_labels : {self.metadata.modified_base_labels}\n"
            f"                mod_bases : {self.metadata.mod_bases}\n"
            f"           mod_long_names : {self.metadata.mod_long_names}\n"
            f"       kmer_context_bases : {self.metadata.kmer_context_bases}\n"
            f"            chunk_context : {self.metadata.chunk_context}\n"
            f"                   motifs : {self.metadata.motifs}\n"
            f"           reverse_signal : {self.metadata.reverse_signal}\n"
            f" chunk_extract_base_start : {self.metadata.base_start_justify}\n"
            f"     chunk_extract_offset : {self.metadata.offset}\n"
            f"          sig_map_refiner : {self.metadata.sig_map_refiner}\n"
        )

    def get_label_counts(self):
        ds_labels = self.labels[
            self.metadata.dataset_start : self.metadata.dataset_end
        ]
        if self.label_conv is None:
            return np.bincount(ds_labels)
        return np.bincount(self.label_conv[ds_labels])

    @property
    def label_summary(self):
        return "; ".join(
            f"{self.metadata.labels[i]}:{c:,}"
            for i, c in enumerate(self.get_label_counts())
        )

    # ------------- metadata load / override -------------
    def load_metadata(self):
        loaded_metadata = DatasetMetadata.load(
            self.metadata_path, self.kmer_table_path
        )
        if self.override_metadata is None:
            self.metadata = DatasetMetadata(**loaded_metadata)
            return
        invalid_keys = []
        for md_key, md_val in self.override_metadata.items():
            if md_key == "dataset_start":
                if md_val < 0:
                    raise RemoraError("Dataset start must be positive")
            elif md_key == "dataset_end":
                if md_val > loaded_metadata["dataset_end"]:
                    raise RemoraError("Cannot set dataset end past loaded end")
            elif md_key == "mod_bases":
                assert "mod_long_names" in self.override_metadata
                assert len(self.override_metadata["mod_long_names"]) == len(md_val)
                stored_mb = list(map(str, loaded_metadata["mod_bases"]))
                assert all(mb in md_val for mb in stored_mb), (
                    "Cannot remove modified base"
                )
                if stored_mb != list(md_val)[: len(stored_mb)]:
                    self.label_conv = np.empty(
                        len(stored_mb) + 1, dtype=np.int64
                    )
                    self.label_conv[0] = 0
                    for in_lab, mod_base in enumerate(stored_mb):
                        self.label_conv[in_lab + 1] = next(
                            idx + 1
                            for idx, mb in enumerate(md_val)
                            if mb == mod_base
                        )
                    LOGGER.debug(
                        f"Setting label conversion: {self.label_conv} "
                        f"{self.data_path}"
                    )
            elif md_key == "mod_long_names":
                assert "mod_bases" in self.override_metadata
            elif md_key == "extra_arrays":
                missing = set(md_val).difference(
                    loaded_metadata["extra_arrays"] or {}
                )
                if missing:
                    raise RemoraError(
                        f"Cannot load missing arrays: {', '.join(missing)}"
                    )
                md_val = {
                    k: loaded_metadata["extra_arrays"][k] for k in md_val
                }
            elif md_key == "chunk_context":
                md_val = tuple(md_val)
                scc = loaded_metadata["chunk_context"] = tuple(
                    loaded_metadata["chunk_context"]
                )
                if md_val[0] > scc[0] or md_val[1] > scc[1]:
                    raise RemoraError(
                        f"Cannot expand chunk context (stored:{scc} ; "
                        f"requested:{md_val})"
                    )
                loaded_metadata["_stored_chunk_context"] = scc
            elif md_key == "kmer_context_bases":
                md_val = tuple(md_val)
                skcb = loaded_metadata["kmer_context_bases"] = tuple(
                    loaded_metadata["kmer_context_bases"]
                )
                if md_val[0] > skcb[0] or md_val[1] > skcb[1]:
                    raise RemoraError(
                        f"Cannot expand kmer context (stored:{skcb} ; "
                        f"requested:{md_val})"
                    )
                loaded_metadata["_stored_kmer_context_bases"] = skcb
            else:
                invalid_keys.append(md_key)
                continue
            if loaded_metadata.get(md_key) != md_val:
                LOGGER.debug(
                    f"Overriding {md_key} from "
                    f"'{loaded_metadata.get(md_key)}' to '{md_val}'"
                )
                loaded_metadata[md_key] = md_val
        if loaded_metadata["dataset_start"] >= loaded_metadata["dataset_end"]:
            raise RemoraError("Loaded dataset is empty")
        if invalid_keys:
            raise RemoraError(
                f"Cannot change metadata values: {', '.join(invalid_keys)}"
            )
        self.metadata = DatasetMetadata(**loaded_metadata)

    def update_metadata(self, other):
        md = {
            k: getattr(other.metadata, k)
            for k in (
                "mod_bases",
                "mod_long_names",
                "extra_arrays",
                "kmer_context_bases",
                "chunk_context",
            )
        }
        md.update(
            {
                "dataset_start": self.metadata.dataset_start,
                "dataset_end": self.metadata.dataset_end,
            }
        )
        self.override_metadata = md
        self.load_metadata()

    # ------------- array management -------------
    def get_array_path(self, array_name):
        if self.data_path is None:
            raise RemoraError("No path available for in-memory dataset")
        if array_name in self._core_arrays:
            return os.path.join(self.data_path, f"{array_name}.npy")
        if array_name in (self.metadata.extra_arrays or {}):
            return os.path.join(self.data_path, f"extra_{array_name}.npy")
        raise RemoraError(f"Invalid extra array name: {array_name}")

    def allocate_arrays(self):
        if self.mode != "w":
            raise RemoraError("Cannot write when mode is not 'w'")
        if self.data_path is not None:
            os.makedirs(self.data_path, exist_ok=True)
        for arr_name, arr_dtype, arr_shape in self.arrays_info:
            if self.data_path is None:
                setattr(self, arr_name, np.empty(arr_shape, dtype=arr_dtype))
            else:
                setattr(
                    self,
                    arr_name,
                    np.memmap(
                        self.get_array_path(arr_name),
                        arr_dtype,
                        mode="w+",
                        shape=arr_shape,
                    ),
                )

    def refresh_memmaps(self):
        if self.data_path is None:
            return
        mode = "r" if self.mode == "r" else "r+"
        for arr_name, arr_dtype, arr_shape in self.arrays_info:
            if hasattr(self, arr_name):
                delattr(self, arr_name)
            setattr(
                self,
                arr_name,
                np.memmap(
                    self.get_array_path(arr_name),
                    arr_dtype,
                    mode=mode,
                    shape=arr_shape,
                ),
            )

    def close_memmaps(self):
        if self.data_path is None:
            return
        for arr_name in self._core_arrays:
            setattr(self, arr_name, None)

    def write_metadata(self):
        self.metadata.write(self.metadata_path, self.kmer_table_path)

    def __post_init__(self):
        self.label_conv = None
        assert self.mode in "rw", "mode must be 'r' or 'w'"
        if self.data_path is None:
            assert self.mode == "w", "In-memory dataset must have mode='w'"
            assert isinstance(self.metadata, DatasetMetadata)
            self.allocate_arrays()
        elif self.mode == "r":
            self.data_path = resolve_path(self.data_path)
            self.load_metadata()
        else:
            assert isinstance(self.metadata, DatasetMetadata)
            self.data_path = resolve_path(self.data_path)
            self.allocate_arrays()
            self.write_metadata()
        self.refresh_memmaps()
        self._iter = None

    # ------------- writing -------------
    def write_batch(self, arrays):
        if self.mode != "w":
            raise RemoraError("Cannot write when mode is not 'w'")
        batch_size = next(iter(arrays.values())).shape[0]
        if any(arr.shape[0] != batch_size for arr in arrays.values()):
            raise RemoraError("All arrays in a batch must be the same size")
        if self.metadata.dataset_end + batch_size > self.metadata.allocate_size:
            self.write_metadata()
            raise RemoraError("Batch write greater than allocated memory")
        missing = set(self.array_names).difference(arrays.keys())
        if missing:
            raise RemoraError(
                f"Batch write must include all arrays. Missing: "
                f"{', '.join(missing)}"
            )
        unspec = set(arrays.keys()).difference(self.array_names)
        if unspec:
            raise RemoraError(
                f"Batch write must only include specified arrays. Found: "
                f"{', '.join(unspec)}"
            )
        en = self.metadata.dataset_end
        for arr_name, in_array in arrays.items():
            getattr(self, arr_name)[en : en + batch_size] = in_array
        self.metadata.dataset_end = en + batch_size

    def write_chunk(self, chunk):
        seq_arr = np.empty(
            (1, self.metadata.sequence_width), dtype=self._core_dtypes["sequence"]
        )
        seq_arr[0, : chunk.seq_w_context.size] = chunk.seq_w_context
        ssm_arr = np.empty(
            (1, self.metadata.sequence_to_signal_mapping_width),
            dtype=self._core_dtypes["sequence_to_signal_mapping"],
        )
        ssm_arr[0, : chunk.seq_to_sig_map.size] = chunk.seq_to_sig_map
        chunk_dict = {
            "signal": np.expand_dims(chunk.signal, axis=0).astype(
                self._core_dtypes["signal"]
            ),
            "sequence": seq_arr,
            "sequence_to_signal_mapping": ssm_arr,
            "sequence_lengths": np.array(
                [chunk.seq_len], dtype=self._core_dtypes["sequence_lengths"]
            ),
            "labels": np.array([chunk.label], dtype=self._core_dtypes["labels"]),
        }
        extras = self.metadata.extra_arrays or {}
        if "read_ids" in extras:
            chunk_dict["read_ids"] = np.array(
                [chunk.read_id], dtype=extras["read_ids"][0]
            )
        if "read_focus_bases" in extras:
            chunk_dict["read_focus_bases"] = np.array(
                [chunk.read_focus_base], dtype=extras["read_focus_bases"][0]
            )
        self.write_batch(chunk_dict)

    def shuffle(self, batch_size=100_000, show_prog=False):
        if self.mode != "w":
            raise RemoraError("Cannot write when mode is not 'w'")
        shuf_indices = np.random.permutation(self.size)
        b_ranges = list(
            zip(
                range(0, self.size, batch_size),
                range(batch_size, self.size + batch_size, batch_size),
            )
        )
        for array_name in self.array_names:
            LOGGER.debug(f"Shuffling {array_name} array")
            array = getattr(self, array_name)[
                self.metadata.dataset_start : self.metadata.dataset_end
            ]
            arr_copy = array.copy()
            for b_st, b_en in b_ranges:
                array[b_st : min(b_en, self.size)] = arr_copy[
                    shuf_indices[b_st:b_en]
                ]
                if self.data_path is not None:
                    getattr(self, array_name).flush()

    def flush(self):
        if self.data_path is None:
            return
        for arr_name in self.array_names:
            getattr(self, arr_name).flush()
        self.refresh_memmaps()

    # ------------- reading -------------
    def adjust_batch_params(self):
        if self.super_batch_size > self.size:
            self.super_batch_size = self.size
        if self.super_batch_sample_frac is None:
            return self.super_batch_size, None
        sb_select = int(
            np.ceil(
                self.super_batch_size
                * self.super_batch_sample_frac
                / self.batch_size
            )
            * self.batch_size
        )
        if sb_select > self.super_batch_size:
            sb_select -= self.batch_size
        if sb_select == 0:
            self.batch_size = int(
                self.super_batch_size * self.super_batch_sample_frac
            )
            sb_select = self.batch_size
        if self.super_batch_sample_frac == 1.0:
            self.super_batch_size = sb_select
        return sb_select, sb_select

    def trim_sb_kmer_context_bases(self, super_batch):
        if not self.metadata.kmer_context_bases_adjusted:
            return super_batch
        seq_diff = (
            self.metadata.stored_kmer_context_bases[0]
            - self.metadata.kmer_context_bases[0]
        )
        if seq_diff > 0:
            seq = super_batch["sequence"]
            if not seq.flags.writeable:
                seq = super_batch["sequence"] = seq.copy()
            seq[:, :-seq_diff] = seq[:, seq_diff:]
        return super_batch

    def trim_sb_chunk_context(self, super_batch):
        if not self.metadata.chunk_context_adjusted:
            return super_batch
        st_diff = (
            self.metadata.stored_chunk_context[0] - self.metadata.chunk_context[0]
        )
        new_en = (
            self.metadata.stored_chunk_context[0] + self.metadata.chunk_context[1]
        )
        super_batch["signal"] = np.ascontiguousarray(
            super_batch["signal"][:, :, st_diff:new_en]
        )
        for name in ("sequence_to_signal_mapping", "sequence",
                     "sequence_lengths"):
            if not super_batch[name].flags.writeable:
                super_batch[name] = super_batch[name].copy()
        super_batch["sequence_to_signal_mapping"] -= st_diff
        trim_sb_chunk_context(
            self.metadata.stored_chunk_context,
            self.metadata.chunk_context,
            sum(self.metadata.kmer_context_bases),
            super_batch["sequence"],
            super_batch["sequence_to_signal_mapping"],
            super_batch["sequence_lengths"],
        )
        return super_batch

    def load_super_batch(self, offset=0, size=None, select_num_chunks=None):
        super_batch = {}
        if self.infinite_iter:
            offset %= self.size
        elif offset >= self.size:
            return None
        sb_st = self.metadata.dataset_start + offset
        if size is None:
            if self.infinite_iter:
                raise RemoraError(
                    "Must specify size of super batch for infinite iter dataset"
                )
            size = self.metadata.dataset_end - sb_st
        if size > self.size:
            raise RemoraError("Super batch larger than dataset requested")
        sb_en = sb_st + size
        if sb_en <= self.metadata.dataset_end:
            for name in self.array_names:
                super_batch[name] = getattr(self, name)[sb_st:sb_en].copy()
        elif self.infinite_iter:
            wrap_en = sb_en - self.size
            for name in self.array_names:
                super_batch[name] = np.concatenate(
                    [
                        getattr(self, name)[sb_st : self.metadata.dataset_end],
                        getattr(self, name)[
                            self.metadata.dataset_start : wrap_en
                        ],
                    ]
                )
        else:
            for name in self.array_names:
                super_batch[name] = getattr(self, name)[
                    sb_st : self.metadata.dataset_end
                ]
        if select_num_chunks is not None:
            sel = np.random.choice(
                super_batch["labels"].size,
                min(select_num_chunks, super_batch["labels"].size),
                replace=False,
            )
            for name in self.array_names:
                super_batch[name] = super_batch[name][sel]
        if self.label_conv is not None:
            super_batch["labels"] = self.label_conv[super_batch["labels"]]
        super_batch = self.trim_sb_kmer_context_bases(super_batch)
        super_batch = self.trim_sb_chunk_context(super_batch)
        return super_batch

    def iter_super_batches(self, select_num_chunks=None):
        sb_num = 0
        while True:
            self.refresh_memmaps()
            super_batch = self.load_super_batch(
                self.super_batch_offset + sb_num * self.super_batch_size,
                self.super_batch_size,
                select_num_chunks=select_num_chunks,
            )
            if super_batch is None:
                break
            if self.do_check_super_batches:
                check_super_batch(super_batch, self.metadata.chunk_width)
            sb_num += 1
            yield super_batch

    def extract_batch(self, super_batch, batch_st):
        batch_en = min(
            batch_st + self.batch_size, super_batch["sequence"].shape[0]
        )
        batch = {
            "enc_kmers": encoded_kmers.compute_encoded_kmer_batch(
                *self.metadata.kmer_context_bases,
                super_batch["sequence"][batch_st:batch_en],
                super_batch["sequence_to_signal_mapping"][batch_st:batch_en],
                super_batch["sequence_lengths"][batch_st:batch_en],
            )
        }
        for name in ["signal", "labels"] + self.metadata.extra_array_names:
            batch[name] = super_batch[name][batch_st:batch_en]
        return batch

    def iter_batches(self, max_batches=None, raw=False):
        """Yield batches; ``raw=True`` skips host enc-kmer computation and
        yields the ragged arrays for on-device featurization."""
        chunks_per_sb, sb_select = self.adjust_batch_params()
        batch_num = 0
        for super_batch in self.iter_super_batches(sb_select):
            for batch_st in range(0, chunks_per_sb, self.batch_size):
                if raw:
                    batch_en = min(
                        batch_st + self.batch_size,
                        super_batch["sequence"].shape[0],
                    )
                    yield {
                        name: super_batch[name][batch_st:batch_en]
                        for name in self.array_names
                    }
                else:
                    yield self.extract_batch(super_batch, batch_st)
                batch_num += 1
                if max_batches is not None and batch_num >= max_batches:
                    return

    def __iter__(self):
        if self._iter is None or not self.infinite_iter:
            self._iter = self.iter_batches()
        return self._iter

    def __next__(self):
        return next(self._iter)


# ----------------------------------------------------------------------
# dataset configs + composition
# ----------------------------------------------------------------------


def parse_dataset_config(config_path, used_configs=None):
    paths, weights, hashes = [], [], []
    config_path = resolve_path(config_path)
    if used_configs is None:
        used_configs = {config_path: config_path}
    with open(config_path) as fh:
        for ds_info in json.load(fh):
            if len(ds_info) == 2:
                ds_path, weight = ds_info
                ds_hash = None
            elif len(ds_info) == 3:
                ds_path, weight, ds_hash = ds_info
            assert weight > 0, "dataset config weight must be positive"
            ds_path = resolve_path(ds_path)
            if not os.path.exists(ds_path):
                raise RemoraError(f"Core dataset path does not exist. {ds_path}")
            if os.path.isdir(ds_path):
                computed = CoreDataset.hash(ds_path)
                if ds_hash is None:
                    ds_hash = computed
                elif ds_hash != computed:
                    raise RemoraError(
                        "Dataset hash does not match value from config for "
                        f"dataset at {ds_path}"
                    )
                paths.append(ds_path)
                weights.append(weight)
                hashes.append(ds_hash)
            else:
                if ds_path in used_configs:
                    raise RemoraError(
                        f"Circular or repeated dataset config reference. "
                        f"{ds_path} found in {config_path}"
                    )
                used_configs[ds_path] = config_path
                sub_paths, sub_weights, sub_hashes = parse_dataset_config(
                    ds_path, used_configs=used_configs
                )
                paths.extend(sub_paths)
                weights.extend(np.asarray(sub_weights) * weight)
                hashes.extend(sub_hashes)
    if len(paths) != len(set(paths)):
        LOGGER.warning("Core datasets loaded multiple times")
    weights = np.array(weights, dtype=float)
    return paths, weights / weights.sum(), hashes


def load_dataset(ds_path):
    """Parse either a core dataset dir or a dataset config file."""
    ds_path = resolve_path(ds_path)
    if not os.path.exists(ds_path):
        raise RemoraError(f"Dataset path does not exist. {ds_path}")
    if os.path.isdir(ds_path):
        return [ds_path], np.ones(1, dtype=float), None
    return parse_dataset_config(ds_path)


def compute_best_split(total_size, props):
    """Integer split of total_size approximately proportional to props."""
    if total_size < len(props):
        raise RemoraError(
            f"total_size ({total_size}) smaller than number of proportions "
            f"{len(props)}"
        )
    sizes = np.floor(total_size * np.asarray(props)).astype(int)
    sizes[sizes == 0] = 1
    while sizes.sum() > total_size:
        sizes[np.argmax(sizes)] -= 1
    while sizes.sum() < total_size:
        sizes[np.argmin((sizes / sizes.sum()) - props)] += 1
    return sizes


class ComposedDataset:
    """Weighted mixture of CoreDatasets yielding combined fixed-size batches.

    Reference analog ``RemoraDataset``; yields dicts of NumPy arrays
    (enc_kmers computed host-side, or raw ragged arrays for on-device
    featurization via ``iter_batches(raw=True)``).
    """

    def __init__(
        self,
        datasets,
        proportions,
        hashes=None,
        batch_size=constants.DEFAULT_BATCH_SIZE,
        super_batch_size=constants.DEFAULT_SUPER_BATCH_SIZE,
        super_batch_sample_frac=None,
        seed=None,
    ):
        self.datasets = datasets
        self.props = proportions
        if not all(0 <= p <= 1 for p in self.props):
            raise RemoraError("Dataset proportions must be between 0 and 1.")
        if len(self.datasets) != len(self.props):
            raise RemoraError("Dataset and proportions must be same length.")
        self._hashes = hashes
        self.set_batch_size(batch_size)
        self.super_batch_size = super_batch_size
        self.super_batch_sample_frac = super_batch_sample_frac
        self.seed = seed
        self.infinite_iter = all(ds.infinite_iter for ds in self.datasets)
        self.set_global_metadata()
        for ds in self.datasets:
            ds.update_metadata(self)
        self.super_batch_offsets = [0 for _ in self.datasets]
        self._ds_iters = None
        self._iter = None
        self._all_batches = None

    # ---- properties ----
    @property
    def num_datasets(self):
        return len(self.datasets)

    @property
    def paths(self):
        return [ds.data_path for ds in self.datasets]

    @property
    def size(self):
        return sum(ds.size for ds in self.datasets)

    @property
    def hashes(self):
        if self._hashes is None or any(h is None for h in self._hashes):
            LOGGER.debug("Computing dataset hashes")
            self._hashes = [ds.hash(ds.data_path) for ds in self.datasets]
        return self._hashes

    @property
    def summary(self):
        return (
            f"                     size : {self.size:,}\n"
            f"     modified_base_labels : {self.metadata.modified_base_labels}\n"
            f"                mod_bases : {self.metadata.mod_bases}\n"
            f"           mod_long_names : {self.metadata.mod_long_names}\n"
            f"       kmer_context_bases : {self.metadata.kmer_context_bases}\n"
            f"            chunk_context : {self.metadata.chunk_context}\n"
            f"                   motifs : {self.metadata.motifs}\n"
            f"           reverse_signal : {self.metadata.reverse_signal}\n"
            f" chunk_extract_base_start : {self.metadata.base_start_justify}\n"
            f"     chunk_extract_offset : {self.metadata.offset}\n"
            f"               pa_scaling : {self.metadata.pa_scaling}\n"
            f"          sig_map_refiner : {self.metadata.sig_map_refiner}\n"
        )

    @property
    def init_kwargs(self):
        return {
            "proportions": self.props,
            "hashes": self._hashes,
            "batch_size": self.batch_size,
            "super_batch_size": self.super_batch_size,
            "super_batch_sample_frac": self.super_batch_sample_frac,
            "seed": self.seed,
        }

    def set_batch_size(self, batch_size):
        self.batch_size = batch_size
        self.batch_sizes = compute_best_split(self.batch_size, self.props)

    # ---- global metadata merge ----
    def set_global_metadata(self):
        self.metadata = self.datasets[0].metadata.copy()
        for md_name in (
            "allocate_size",
            "max_seq_len",
            "dataset_start",
            "dataset_end",
        ):
            setattr(self.metadata, md_name, None)
        merged = sequtil.merge_motifs(self.metadata.motifs)
        self.metadata.motif_sequences, self.metadata.motif_offsets = zip(
            *[m.to_tuple() for m in merged]
        )
        self.metadata.motif_sequences = list(self.metadata.motif_sequences)
        self.metadata.motif_offsets = list(self.metadata.motif_offsets)
        self.metadata.check_motifs()
        for ds in self.datasets[1:]:
            for attr_name in (
                "modified_base_labels",
                "base_start_justify",
                "offset",
                "reverse_signal",
                "pa_scaling",
                "sig_map_refiner",
            ):
                if getattr(ds.metadata, attr_name) != getattr(
                    self.metadata, attr_name
                ):
                    raise RemoraError(
                        f"All datasets must have same {attr_name} "
                        f"{getattr(ds.metadata, attr_name)} != "
                        f"{getattr(self.metadata, attr_name)}"
                    )
            if set(ds.metadata.extra_array_names) != set(
                self.metadata.extra_array_names
            ):
                raise RemoraError(
                    f"Extra arrays not equal: {ds.metadata.extra_array_names} "
                    f"!= {self.metadata.extra_array_names}"
                )
            for mb, mln in zip(ds.metadata.mod_bases, ds.metadata.mod_long_names):
                if mb in self.metadata.mod_bases:
                    md_mln = next(
                        ln
                        for b, ln in zip(
                            self.metadata.mod_bases, self.metadata.mod_long_names
                        )
                        if mb == b
                    )
                    assert mln == md_mln, "Mismatched modified bases."
                else:
                    self.metadata.mod_bases.append(mb)
                    self.metadata.mod_long_names.append(mln)
            if ds.metadata.kmer_context_bases != self.metadata.kmer_context_bases:
                self.metadata.kmer_context_bases = (
                    min(
                        self.metadata.kmer_context_bases[0],
                        ds.metadata.kmer_context_bases[0],
                    ),
                    min(
                        self.metadata.kmer_context_bases[1],
                        ds.metadata.kmer_context_bases[1],
                    ),
                )
            if ds.metadata.chunk_context != self.metadata.chunk_context:
                self.metadata.chunk_context = (
                    min(
                        self.metadata.chunk_context[0],
                        ds.metadata.chunk_context[0],
                    ),
                    min(
                        self.metadata.chunk_context[1],
                        ds.metadata.chunk_context[1],
                    ),
                )
            if set(ds.metadata.motifs) != set(self.metadata.motifs):
                merged = sequtil.merge_motifs(
                    self.metadata.motifs + ds.metadata.motifs
                )
                (
                    self.metadata.motif_sequences,
                    self.metadata.motif_offsets,
                ) = map(list, zip(*[m.to_tuple() for m in merged]))
                self.metadata.check_motifs()
        # sort modified bases alphabetically
        order = sorted(
            range(len(self.metadata.mod_bases)),
            key=self.metadata.mod_bases.__getitem__,
        )
        self.metadata.mod_bases = [self.metadata.mod_bases[i] for i in order]
        self.metadata.mod_long_names = [
            self.metadata.mod_long_names[i] for i in order
        ]

    def update_metadata(self, other):
        for md_key in (
            "modified_base_labels",
            "offset",
            "reverse_signal",
            "pa_scaling",
            "sig_map_refiner",
        ):
            if getattr(self.metadata, md_key) != getattr(other.metadata, md_key):
                raise RemoraError(
                    f"Cannot update metadata with mismatching '{md_key}'."
                )
        for ds in self.datasets:
            ds.update_metadata(other)
        for md_key in (
            "mod_bases",
            "mod_long_names",
            "extra_arrays",
            "kmer_context_bases",
            "chunk_context",
        ):
            setattr(self.metadata, md_key, getattr(other.metadata, md_key))

    # ---- construction ----
    @classmethod
    def from_config(cls, config_path, override_metadata=None, ds_kwargs=None,
                    **kwargs):
        paths, props, hashes = parse_dataset_config(config_path)
        if override_metadata is None:
            override_metadata = {}
        if ds_kwargs is None:
            ds_kwargs = {}
        datasets = [
            CoreDataset(
                ds_path, override_metadata=override_metadata.copy(), **ds_kwargs
            )
            for ds_path in paths
        ]
        return cls(datasets, props, hashes, **kwargs)

    def train_test_split(self, num_test_chunks, override_metadata=None):
        test_sizes = compute_best_split(num_test_chunks, self.props)
        if override_metadata is None:
            override_metadata = {}
        train_datasets, test_datasets = [], []
        for ds, test_size in zip(self.datasets, test_sizes):
            if test_size >= ds.size:
                raise RemoraError("Not enough chunks")
            trn_md = override_metadata.copy()
            trn_md["dataset_start"] = ds.metadata.dataset_start + test_size
            train_datasets.append(
                CoreDataset(ds.data_path, override_metadata=trn_md)
            )
            test_md = override_metadata.copy()
            test_md["dataset_end"] = ds.metadata.dataset_start + test_size
            test_datasets.append(
                CoreDataset(
                    ds.data_path, infinite_iter=False, override_metadata=test_md
                )
            )
        return (
            ComposedDataset(train_datasets, **self.init_kwargs),
            ComposedDataset(test_datasets, **self.init_kwargs),
        )

    def head(self, num_chunks, override_metadata=None):
        ds_sizes = compute_best_split(num_chunks, self.props)
        if override_metadata is None:
            override_metadata = {}
        head_datasets = []
        for ds, ds_size in zip(self.datasets, ds_sizes):
            if ds_size >= ds.size:
                raise RemoraError("Not enough chunks")
            head_md = override_metadata.copy()
            head_md["dataset_start"] = ds.metadata.dataset_start
            head_md["dataset_end"] = ds.metadata.dataset_start + ds_size
            head_datasets.append(
                CoreDataset(
                    ds.data_path, infinite_iter=False, override_metadata=head_md
                )
            )
        return ComposedDataset(head_datasets, **self.init_kwargs)

    # ---- iteration ----
    def _set_sub_ds_iters(self, raw=False):
        for ds, bs, sb_off in zip(
            self.datasets, self.batch_sizes, self.super_batch_offsets
        ):
            ds.batch_size = int(bs)
            ds.super_batch_offset = sb_off
            ds.super_batch_size = self.super_batch_size
            ds.super_batch_sample_frac = self.super_batch_sample_frac
        self._ds_iters = [ds.iter_batches(raw=raw) for ds in self.datasets]

    def iter_batches(self, return_arrays=("enc_kmers", "signal", "labels"),
                     raw=False):
        if self._ds_iters is None:
            self._set_sub_ds_iters(raw=raw)
        names = (
            list(return_arrays)
            if not raw
            else list(self.datasets[0].array_names)
        )

        def concat(name, arrays):
            if raw and arrays[0].ndim == 2:
                # ragged widths can differ between sub-datasets (different
                # stored max_seq_len); right-pad to the widest
                width = max(a.shape[1] for a in arrays)
                if any(a.shape[1] != width for a in arrays):
                    arrays = [
                        np.pad(a, ((0, 0), (0, width - a.shape[1])))
                        for a in arrays
                    ]
            return np.concatenate(arrays)

        while True:
            try:
                ds_arrays = [next(it) for it in self._ds_iters]
            except StopIteration:
                break
            yield {
                name: concat(name, [arrs[name] for arrs in ds_arrays])
                for name in names
            }

    def load_all_batches(self):
        if self.infinite_iter:
            raise RemoraError("Cannot save all batches for infinite dataset")
        self._set_sub_ds_iters()
        self._all_batches = list(self.iter_batches())
        for ds in self.datasets:
            ds.close_memmaps()

    def __iter__(self):
        if self._all_batches is not None:
            self._iter = iter(self._all_batches)
            return self._iter
        if self._iter is None or not self.infinite_iter:
            self._set_sub_ds_iters()
            self._iter = self.iter_batches()
        return self._iter

    def __next__(self):
        return next(self._iter)

    # ---- stats / config ----
    def get_label_counts(self):
        label_counts = np.zeros(self.metadata.num_labels, dtype=int)
        for ds in self.datasets:
            for idx, count in enumerate(ds.get_label_counts()):
                label_counts[idx] += count
        return label_counts

    @property
    def label_summary(self):
        return "; ".join(
            f"{self.metadata.labels[i]}:{c:,}"
            for i, c in enumerate(self.get_label_counts())
        )

    def get_config(self):
        return [
            (p, w) if h is None else (p, w, h)
            for p, w, h in zip(self.paths, self.props, self.hashes)
        ]

    def epoch_summary(self, batches_per_epoch):
        """Per-dataset draw rates and per-label batch/total counts
        (reference ``RemoraDataset.epoch_summary`` format)."""
        epoch_totals = [batches_per_epoch * bs for bs in self.batch_sizes]
        dss_lab_counts = [
            dict(zip(ds.metadata.labels, ds.get_label_counts()))
            for ds in self.datasets
        ]
        dss_lab_props = []
        for ds_lab_counts in dss_lab_counts:
            ds_tot = sum(ds_lab_counts.values())
            dss_lab_props.append(
                {lab: cnt / ds_tot for lab, cnt in ds_lab_counts.items()}
            )
        batch_lab_cols = [
            "\t".join(
                f"{int(np.ceil(ds_lp.get(lab, 0) * ds_bs)):,}"
                for lab in self.metadata.labels
            )
            for ds_lp, ds_bs in zip(dss_lab_props, self.batch_sizes)
        ]
        dss_lab_cols = [
            "\t".join(
                f"{ds_lc.get(lab, 0):,}" for lab in self.metadata.labels
            )
            for ds_lc in dss_lab_counts
        ]
        summ_strs = [
            f"{tot / ds.size:10.4%}\t{b_cols}\t{tot:,}\t{ds.size:,}\t"
            f"{ds_cols}\t{ds.data_path}"
            for tot, b_cols, ds, ds_cols in zip(
                epoch_totals, batch_lab_cols, self.datasets, dss_lab_cols
            )
        ]
        b_header = "\t".join(
            f"batch_{lab}" for lab in self.metadata.labels
        )
        ds_header = "\t".join(
            f"dataset_{lab}" for lab in self.metadata.labels
        )
        return (
            f"percent_of_dataset_per_epoch\t{b_header}\t"
            f"dataset_chunks_per_epoch\tdataset_size\t{ds_header}\tpath\n"
        ) + "\n".join(summ_strs)


def worker_init(dataset, seed=None, worker_id=0):
    """Randomize per-worker super-batch offsets (reference
    ``dataloader_worker_init`` analog for our host loader workers)."""
    if seed is not None:
        np.random.seed(seed + worker_id)
    dataset.super_batch_offsets = [
        np.random.randint(0, sub_ds.size) for sub_ds in dataset.datasets
    ]
