"""North-star extensions: the operations a large-scale training-data
pipeline needs, designed shuffle-first for 100 TB.

* dedup.py      exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
                cosine near-dup
* similarity.py brute-force cosine top-k baseline + LSH-bucketed ANN
* textstats.py  language-ID, quality scoring, token counting,
                document fingerprinting
* multimodal.py opaque binary columns with typed metadata; decode /
                feature-extract plumbing (libs stubbed)

Design rules: no driver-side materialization, candidate generation is
always key-bucketed (band join) so the pair space never goes O(n^2),
high-frequency buckets are capped explicitly (logged, not silent), and
every hash is a portable integer fold so results are reproducible
across engines (the DuckDB oracle runs the same arithmetic).
"""
