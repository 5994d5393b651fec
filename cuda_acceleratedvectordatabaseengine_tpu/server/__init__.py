"""Serving layer (reference ``server/``, SURVEY.md §2.6).

  - ``service``   → QueryServiceImpl / AdminServiceImpl (S2, S3)
  - ``coalescer`` → windowed request batcher (S4) — here it actually feeds
                    the batched search path (the reference's queue was never
                    fed, ``query_service.cpp:267-401``)
  - ``ratelimit`` → token-bucket rate limiter (S5)
  - ``balancer``  → circuit breaker / concurrency caps / priority queue
                    (S7, S8)
  - ``metrics``   → Prometheus metrics + real exposition endpoint (S6, S10 —
                    the reference's :8080 endpoint was a stub)
  - ``health``    → grpc.health.v1 protocol (S9)
  - ``config``    → one real config system: YAML + CLI, actually parsed
                    (the reference's production.yaml is parsed by nothing)
  - ``main``      → bootstrap (S1)
"""
