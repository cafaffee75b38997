"""Constants shared between the device combine-greedy kernels
(ops/combine_greedy, imports jax) and their client-side packers
(parallel/combine_device_greedy, which must stay jax-free: a combine
CLI talking to the device daemon never initializes JAX itself, and
`import jax` alone costs ~1.8s of client wall-clock)."""

SCALE = 1 << 20          # rational-key fraction scale (ops/combine_greedy)
NMAX = 1024              # max group size for key exactness
CMM_MAX = 1023           # max combine_match_max for key exactness
SPAN_MAX = 1 << 18       # max local coordinate / |svlen| (int32 budget)
EPS = 1e-5               # float32-vs-float64 ambiguity margin

# per-segment flag bits for the whole-task grid kernel
SEGF_AMBIGUOUS, SEGF_ED_MISS, SEGF_N_OVERFLOW = 1, 2, 4

# potential-head ED table depth per segment (grid kernel)
TASK_ED_HEADS = 8

# per-segment candidate cap for the grid kernel
SEG_LMAX = 2048

# device-vs-host dispatch threshold for edit-distance batches, in DP
# cells (mirrors ops/edit_distance_jax.DEVICE_MIN_CELLS, which asserts
# they stay equal; duplicated so jax-free callers can consult it)
ED_DEVICE_MIN_CELLS = 2 * 10 ** 8
