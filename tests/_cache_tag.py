"""Host-keyed CPU compile-cache directory (no jax imports).

XLA:CPU's persistent cache stores AOT machine code for the exact host ISA,
but the cache key omits host features: replaying a blob compiled on a
different container host (observed: AVX512/+prefer-no-scatter machine ->
a host without those) makes cpu_aot_loader warn "could lead to execution
errors such as SIGILL" and the process aborts in the thunk executor.
Keying the directory by a CPU-flags fingerprint gives each host type a
fresh cache instead of someone else's machine code.
"""

import hashlib
import os


def host_cache_dir() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.sha256(flags.encode()).hexdigest()[:12]
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", f".jax_cache-{tag}")
    )
