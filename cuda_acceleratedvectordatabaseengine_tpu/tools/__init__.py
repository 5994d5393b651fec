"""Operational CLIs.

  - ``build_index``  → ``vdb-build-index``: the offline index builder the
                       reference's build system references but never ships
                       (I12 — ``indexmgr/CMakeLists.txt:8-47`` lists five
                       translation units; none exist)
  - ``benchmark``    → ``vdb-benchmark``: end-to-end train/add/search
                       throughput benchmark with the reference's CSV schema
                       (X6, ``bench/benchmark.cpp:181-196``)
  - ``recall_test``  → recall@k evaluator vs exact ground truth (X7 —
                       referenced at ``bench/CMakeLists.txt:29-44``, file
                       missing in the reference)
  - ``load_test``    → concurrent gRPC load-test client (X4,
                       ``test/integration/load_test.cpp``)
"""
