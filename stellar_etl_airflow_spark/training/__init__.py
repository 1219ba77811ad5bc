"""Large-scale training-data pipeline operators.

Beyond-parity extensions (SURVEY §7.1 step 10): the operations a 100 TB
LLM-training-data pipeline needs, built on the same DataFrame substrate as
the reference-parity engine:

- ``dedup``      — exact (hash groupBy), n-gram Jaccard, MinHash + LSH,
                   SimHash, embedding-cosine near-dup.
- ``similarity`` — brute-force cosine top-k baseline and a random-hyperplane
                   LSH-bucketed variant (the scale path).
- ``text``       — language-ID heuristic, quality scoring, token counting,
                   document fingerprinting.
- ``components`` — connected components over near-dup pair graphs
                   (min-label propagation + pointer jumping) and the
                   representative keep/drop decision.
- ``multimodal`` — opaque binary columns + typed metadata; decode /
                   feature-extract as Arrow-batched ``mapInPandas`` with the
                   heavy codec step stubbed (image/audio libs are not in
                   this container).

Everything except the multimodal codec stays in JVM whole-stage codegen:
higher-order array functions (transform/aggregate/zip_with) rather than
Python UDFs, so the hot paths scale with executors, not with the Python
interpreter.
"""
