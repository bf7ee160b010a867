"""Framework-wide defaults.

Values that define work-per-step and data-prep semantics mirror the
reference (``/root/reference/src/remora/constants.py``) so that datasets
and models are interoperable; TPU-specific knobs are new here.
"""

DEFAULT_NN_SIZE = 64
DEFAULT_BATCH_SIZE = 2_048
DEFAULT_SUPER_BATCH_SIZE = 100_000
DEFAULT_SUPER_BATCH_SAMPLE_FRAC = 1.0
DEFAULT_CHUNKS_PER_EPOCH = 10_000_000
DEFAULT_NUM_TEST_CHUNKS = 10_000
DEFAULT_CHUNK_CONTEXT = (200, 200)
DEFAULT_MIN_SAMPLES_PER_BASE = 5
DEFAULT_KMER_CONTEXT_BASES = (4, 4)
DEFAULT_KMER_LEN = sum(DEFAULT_KMER_CONTEXT_BASES) + 1
DEFAULT_FILT_FRAC = 0.1
DEFAULT_MAX_CHUNKS_PER_READ = 15

# train args
DEFAULT_EPOCHS = 100
DEFAULT_EARLY_STOPPING = 10

TYPE_CONVERTERS = {"str": str, "int": int, "float": float}

# optimizer
DEFAULT_OPTIMIZER = "adamw"
DEFAULT_OPT_VALUES = (("weight_decay", 1e-4, "float"),)

# learning rate scheduler
DEFAULT_LR = 0.001
DEFAULT_SCHEDULER = "cosine"
DEFAULT_SCH_VALUES = (
    ("T_max", DEFAULT_EPOCHS, "int"),
    ("eta_min", 1e-6, "float"),
)
DEFAULT_SCH_COOL_DOWN_EPOCHS = 5
DEFAULT_SCH_COOL_DOWN_LR = 1e-7

FINAL_MODEL_FILENAME = "model_final.checkpoint"
BEST_MODEL_FILENAME = "model_best.checkpoint"
FINAL_EXPORT_MODEL_FILENAME = "model_final.rtpu"
BEST_EXPORT_MODEL_FILENAME = "model_best.rtpu"

MODEL_VERSION = 3
DATASET_VERSION = 3

DEFAULT_REFINE_HBW = 5

DEFAULT_REFINE_SHORT_DWELL_PARAMS = (4, 3, 0.5)
REFINE_ALGO_VIT_NAME = "Viterbi"
REFINE_ALGO_DWELL_PEN_NAME = "dwell_penalty"
REFINE_ALGOS = (REFINE_ALGO_DWELL_PEN_NAME, REFINE_ALGO_VIT_NAME)
DEFAULT_REFINE_ALGO = REFINE_ALGO_DWELL_PEN_NAME
ROUGH_RESCALE_LEAST_SQUARES = "least_squares"
ROUGH_RESCALE_THEIL_SEN = "theil_sen"
ROUGH_RESCALE_METHODS = (ROUGH_RESCALE_LEAST_SQUARES, ROUGH_RESCALE_THEIL_SEN)
# execution backends for the banded refinement DP (a runtime routing
# choice, not part of dataset/model metadata): auto = native C++ when
# built, else NumPy; device = the single-launch Pallas TPU kernels
REFINE_BACKEND_AUTO = "auto"
REFINE_BACKEND_NATIVE = "native"
REFINE_BACKEND_NUMPY = "numpy"
REFINE_BACKEND_DEVICE = "device"
REFINE_BACKENDS = (
    REFINE_BACKEND_AUTO,
    REFINE_BACKEND_NATIVE,
    REFINE_BACKEND_NUMPY,
    REFINE_BACKEND_DEVICE,
)
# reads per micro-batch for the device DP stage (amortizes Pallas
# launches + host<->device transfers across reads)
REFINE_DEVICE_READ_BATCH = 64
# widest per-base band the single-launch Pallas DP accepts: the
# kernel's per-band scratch scales with the band width, and degenerate
# mappings (large deletions/stays) can demand bands of thousands of
# columns — such reads route to the host DP. Round 5 moved the
# traceback rows out of blocked VMEM (per-base DMA from a 2-deep
# staging buffer, kernels/pallas_dp.py) and raised the kernel's
# scoped-VMEM allowance past the 16MB default budget (the fold scratch
# fits physical VMEM with margin: ~7900-wide bands measured path-exact
# on v5e, PERF.md round 5). The binding constraint at 4096 is the
# (N, W, 128) int16 HBM traceback tensor, which the per-launch budget
# guard (_dp_tb_bytes / REMORA_TPU_DP_TB_BUDGET_MB) enforces per read
# independently of this cap. Real-read host routing at 4096 is the
# same 3.6% pathological-mapping tail as at 2048 (p99 band = 14439);
# the synthetic all-stall stress set drops from 38.8% routed to 0%.
REFINE_DEVICE_MAX_BAND = 4096
DEFAULT_ROUGH_RESCALE_METHOD = ROUGH_RESCALE_LEAST_SQUARES

PA_TO_NORM_SCALING_FACTOR = 1.4826

MAX_POINTS_FOR_THEIL_SEN = 1000

MODBASE_MODEL_NAME = "modbase_model.pt"
MODEL_DATA_DIR_NAME = "trained_models"

# TPU-specific defaults
DEFAULT_INFER_BUCKETS = (256, 512, 1024, 2048)
DEFAULT_MESH_AXIS = "data"
