"""libgiddy_spark — a from-scratch PySpark-native per-column lightweight
compression engine with the scheme family of eyalroz/libgiddy
(dictionary, RLE, frame-of-reference + bit-packing, delta, patching) plus
an FSST-style string symbol table, a per-partition codec auto-selector,
a checkpointed/resumable encode manifest, and skew-aware repartitioning.

Design (SURVEY.md): the codecs are vectorized numpy/pyarrow kernels that
run inside Arrow-batched Spark UDFs (``mapInArrow`` / ``applyInPandas``)
— mirroring how libgiddy sits as a GPU kernel library inside a host DBMS
(reference semantics: libgiddy src/kernels/decompression/*, recalled from
public knowledge; the sandbox reference snapshot is empty, see SURVEY.md §0).
Catalyst handles scans, pruning, the one encode shuffle, and sinks; no
per-row Python anywhere.
"""

__version__ = "0.1.0"

import os as _os

# Keep glibc from mmap/munmap-ing every large numpy buffer: freshly
# mapped pages fault-in extremely slowly on virtualized hosts (measured
# ~10 s per 100 MB first-touch on this sandbox vs ~1 ms reused). Heap
# reuse makes the Arrow/numpy kernels allocation-stable. Set before the
# JVM (and thus the pyspark worker daemons) is spawned; for real
# clusters also pass via spark.executorEnv.* (see bench.py/make_spark).
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
# Arrow's default pool (mimalloc) mmaps/munmaps its own segments and
# bypasses glibc entirely; route it through the system allocator so the
# same retained heap serves Arrow buffers (read before pyarrow import).
_os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
