"""Native C++ runtime pieces, built on demand (g++ -O3 -shared).

Currently: the data loader (image decode + threaded prefetch) — the
native-IO analogue of the reference's OpenCV-imread benchmark loop
(app/run_pipeline.cpp:397-407). Python binding via ctypes (no pybind11 in
this image). Import `plsvo_tpu.native.loader`; it builds the shared object
next to the source on first use and caches it.
"""
