"""Streaming MinHash/LSH near-duplicate detection: the signature store
as watermark-bounded streaming state.

Every dedup-family member so far was batch-shaped — even
``dedup_incremental`` (operators/dedup.py) matches a finished NEW batch
against a finished OLD corpus.  Production ingest wants the other shape:
documents arrive continuously and each must be checked against what was
ALREADY ingested, live.  The reference's keyed ``process_state``
(reference src/lib.rs:323-361) is exactly this substrate; this module
runs the MinHash/LSH construction on ``applyInPandasWithState``.

Architecture (the 100 TB contract):

- **State is keyed by LSH band bucket, not by document.**  The stream
  carries, per document, its hashed shingle set and the full array of
  band bucket keys (JVM ``xxhash64`` per shingle + one vectorized
  numpy fold for the permutation mins — same deterministic hash family
  as the batch path in ``operators/dedup.py``, pinned by test).
  Exploding to ``(band, bucket)`` rows
  routes every document to the 16 groups where a collision could
  occur, so candidate generation is an equi-shuffle on bounded keys —
  never an all-pairs comparison.
- **State is bounded by the pairing window, not corpus size.**  The
  eviction contract: two documents pair only if their event times lie
  within ``window`` of each other, so a bucket's buffer keeps only
  documents with ``ts >= watermark - window`` — retained bytes per
  bucket ≈ window × per-bucket ingest rate (× the 16-band routing
  fan-out).  ``store_shingles=False`` (r14, the production-constant
  knob) keeps only the 64-long signature instead of the shingle set
  and verifies by the standard MinHash estimator — the per-doc payload
  becomes LENGTH-INDEPENDENT (measured: 113.5 → 50.4 MB live state at
  sf0.1, 2.25× on this short-doc corpus; the ratio grows with document
  length, ~|shingles|/num_perm on real crawl docs) at the cost of
  estimation error around the threshold (measured on the registered
  fixture: the estimator-selected pair set EQUALS the exact set,
  pinned by test).  Without a
  window the signature store grows with the corpus — that variant is
  the batch ``minhash_lsh_join`` against a persisted index, not a
  streaming state store.
- **Emission is watermark-final** (the streaming/cep.py rule): a pair
  emits only once the watermark passes the LATER document's timestamp.
  A sealed pair is immutable, so the emitted set is independent of
  micro-batch slicing, and the reference's no-end-of-stream-flush
  semantic holds (src/lib.rs:1316-1345): pairs whose later document
  lies inside the final watermark horizon never emit.
- **Exactly-once across bands without a second stateful operator:**
  two documents sharing k band buckets would emit k copies.  Each
  row carries the full band-key array, so every bucket group can
  compute the pair's CANONICAL band — the smallest band index where
  the two signatures collide — and only that group emits.  No
  post-dedup pass, no second state store.
- **Quiet buckets flush via event-time timers** (the sessions/CEP
  mechanism): a bucket holding an unsealed candidate registers a timer
  just past that document's timestamp, so the final no-data batch
  (watermark advance under Trigger.AvailableNow) fires the emission.

Verification inside the handler is EXACT Jaccard over the carried
shingle sets (candidate-pair-bounded, as everywhere in the dedup
family), so the emitted set equals the batch all-pairs oracle under the
window + finality filters — a full value-hash DuckDB twin, no
rows-only check.
"""

from __future__ import annotations

import pickle

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["attach_minhash_bands", "minhash_dedup_streaming"]


def _round_half_up(x: float, digits: int = 4) -> float:
    """HALF_UP rounding on the double's shortest decimal representation
    — the semantics Spark's ``F.round`` (BigDecimal of the double) and
    DuckDB's ``round`` apply.  Python's builtin ``round`` is banker's
    (ties to even), and exact binary ties DO occur here: Jaccard values
    with power-of-two unions are dyadic, e.g. 17/32 = 0.53125 rounds to
    0.5313 under HALF_UP but 0.5312 under the builtin — a latent
    oracle-hash divergence on any corpus where such a pair appears."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def attach_minhash_bands(
    sdf: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    keep_signature: bool = False,
) -> DataFrame:
    """Add ``shingles`` (distinct word n-gram set as int64 ``xxhash64``
    values) and ``bands`` (one LSH bucket key per band) columns to a
    streaming DataFrame — no shuffle, no groupBy, streaming-safe.

    Same deterministic construction as the batch path: word n-grams
    from ``split(text, '\\s+')`` assembled with O(1) ``element_at``
    lookups, each shingle hashed ONCE with JVM ``xxhash64``, permuted by
    the shared universal-hash family (:func:`operators.dedup.
    minhash_coeffs` — fixed seed, so stream and batch signatures agree
    bit-for-bit, pinned by test), band keys via the same
    ``xxhash64(band, h...)`` as :func:`operators.dedup._band_keys`.

    The ``num_perm`` permutation MINIMUMS run in one Arrow-batched
    pandas UDF as a vectorized numpy broadcast (shingles × perms int64
    matrix, exact — operands stay < 2⁶², the batch path's documented
    bound).  Two measured plan hazards shape the layout (sf0.1, 5k
    docs × ~250 shingles):

    - Catalyst evaluates higher-order lambdas INTERPRETED per element —
      the first cut's 64-field ``aggregate`` struct fold (80M lambda
      evals) measured 25 s; the numpy broadcast does the identical
      arithmetic in well under a second.
    - CollapseProject inlines the gram-assembly ``transform`` into every
      consumer (filter + UDF input + carry = 4 evaluations ≈ 30 s
      measured, ~9 s each).  The gram expression is therefore consumed
      EXACTLY ONCE — as the pandas UDF's input projection — and the UDF
      echoes the hashed shingle array back in its output struct next to
      the signature, so downstream reads are attribute references, and
      the pre-UDF filter tests the raw token count (cheap codegen)
      rather than the gram array.

    Downstream state carries the int64 shingle hashes, not the strings:
    Jaccard over the hashed sets equals string Jaccard up to 64-bit
    collisions inside one document pair (probability ≈ |set|²/2⁶⁵ ≈
    10⁻¹², and deterministic either way), and the explode-by-16-bands
    shuffle moves 8-byte values instead of 20-byte grams."""
    from pyspark.sql.functions import pandas_udf

    from tamar_spark.operators.dedup import minhash_coeffs

    if num_perm % bands:
        raise ValueError("num_perm must divide evenly into bands")
    rows = num_perm // bands
    p, coeffs = minhash_coeffs(num_perm)

    w = F.split(F.col(text_col), r"\s+")
    sdf = sdf.filter(F.size(w) >= n)  # grams nonempty ⇔ tokens ≥ n
    idx = F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    gram_hashes = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.xxhash64(
                F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)])
            ),
        )
    )

    a_vec = [a for a, _ in coeffs]
    b_vec = [b for _, b in coeffs]

    def _sig(cols):
        import numpy as np

        A = np.array(a_vec, dtype=np.int64)
        B = np.array(b_vec, dtype=np.int64)
        sh_out, sig_out = [], []
        for arr in cols:
            x = np.asarray(arr, dtype=np.int64)
            xp = ((x % p) + p) % p  # JVM pmod semantics
            hm = (xp[:, None] * A[None, :] + B[None, :]) % p
            sh_out.append(x)
            sig_out.append(hm.min(axis=0))
        return pd.DataFrame({"sh": sh_out, "sig": sig_out})

    sig_udf = pandas_udf(_sig, "struct<sh: array<long>, sig: array<long>>")
    sdf = sdf.withColumn("_mh", sig_udf(gram_hashes))
    band_arr = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[
                    F.element_at(F.col("_mh.sig"), b * rows + r + 1)
                    for r in range(rows)
                ],
            )
            for b in range(bands)
        ]
    )
    out = sdf.withColumn("shingles", F.col("_mh.sh")).withColumn(
        "bands", band_arr
    )
    if keep_signature:
        # the store_shingles=False state variant verifies by signature
        # instead of shingle sets — expose the permutation minimums
        out = out.withColumn("sig", F.col("_mh.sig"))
    return out.drop("_mh")


def minhash_dedup_streaming(
    sdf: DataFrame,
    threshold: float,
    window_us: int,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    store_shingles: bool = True,
) -> DataFrame:
    """Run the band-bucket signature store over a stream prepared by
    :func:`attach_minhash_bands` (watermark already applied) and emit
    near-dup pairs ``(doc_id_1, doc_id_2, jaccard)`` — ``doc_id_1 <
    doc_id_2``, 4dp HALF_UP rounded like the batch family.

    ``store_shingles=True`` (default) buffers each document's hashed
    shingle set and verifies candidates by EXACT Jaccard.  With
    ``store_shingles=False`` the state keeps only the ``num_perm``-long
    signature (requires :func:`attach_minhash_bands`'s
    ``keep_signature=True``) and verifies by the standard MinHash
    estimator — the matching-component fraction, an unbiased estimate
    of Jaccard (Broder 1997) computed in deterministic integer
    arithmetic, so the emitted set is exactly reproducible; ``jaccard``
    then carries the ESTIMATE.  State shrinks toward
    ~|shingles|/num_perm (length-independent payload; measured 2.25×
    live at sf0.1, where docs are deliberately short) — the production
    constant for high-rate ingest where the doc store lives elsewhere.

    See the module docstring for the state/eviction/finality contract.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    payload_col = "shingles" if store_shingles else "sig"

    def handle(key, pdfs, gstate):
        band_idx = int(key[0])
        if gstate.exists:
            blob = pickle.loads(bytes(gstate.get[0]))
            docs, prev_wm_us = blob["docs"], blob["wm_us"]
        else:
            docs, prev_wm_us = {}, -1

        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")
            for rid, tus, payload, bd in zip(
                pdf[id_col], ts_us, pdf[payload_col], pdf["bands"]
            ):
                rid = int(rid)
                if rid not in docs:  # idempotent on source replays
                    docs[rid] = (
                        int(tus),
                        frozenset(payload)
                        if store_shingles
                        else tuple(int(x) for x in payload),
                        tuple(int(x) for x in bd),
                    )

        wm_us = gstate.getCurrentWatermarkMs() * 1000
        out_rows = []
        next_seal_us = None
        if docs:
            order = sorted(docs.items(), key=lambda kv: (kv[1][0], kv[0]))
            for j in range(len(order)):
                idj, (tj, shj, bdj) = order[j]
                if tj >= wm_us:
                    # unsealed: drives a timer if an in-window earlier
                    # partner exists, so the pair emits on watermark
                    # advance even if this bucket sees no more data.
                    # The buffer is ts-sorted, so the immediate
                    # predecessor has the smallest gap — one O(1) probe,
                    # not a buffer scan (r13 review finding)
                    if j > 0 and tj - order[j - 1][1][0] <= window_us:
                        if next_seal_us is None or tj < next_seal_us:
                            next_seal_us = tj
                    continue
                if tj < prev_wm_us:
                    continue  # this doc's pairs emitted in an earlier batch
                # walk earlier docs newest-first and STOP at the window
                # edge (the buffer is ts-sorted): pair work per doc is
                # bounded by the in-window neighborhood even when one
                # micro-batch delivers far more than a window's worth
                for i in range(j - 1, -1, -1):
                    idi, (ti, shi, bdi) = order[i]
                    if tj - ti > window_us:
                        break
                    # canonical band: exactly one bucket group emits a pair
                    first = next(
                        (b for b in range(len(bdi)) if bdi[b] == bdj[b]),
                        None,
                    )
                    if first != band_idx:
                        continue
                    if store_shingles:
                        inter = len(shi & shj)
                        if not inter:
                            continue
                        union = len(shi) + len(shj) - inter
                        jac = inter / union
                    else:
                        # MinHash estimator: matching-component fraction
                        # over the stored signatures — deterministic
                        # integer counting, 4dp-exact under HALF_UP
                        matches = sum(
                            1 for a, b in zip(shi, shj) if a == b
                        )
                        if not matches:
                            continue
                        jac = matches / len(shi)
                    if jac >= threshold:
                        a, b = (idi, idj) if idi < idj else (idj, idi)
                        out_rows.append((a, b, _round_half_up(jac)))
            # eviction contract: a doc older than (watermark - window)
            # can never pair with an admissible future row (future event
            # times are >= watermark, so the gap would exceed the window)
            docs = {
                rid: v for rid, v in docs.items() if v[0] >= wm_us - window_us
            }

        if not docs:
            # window expiry emptied the bucket: drop the state entry
            # entirely rather than keeping a tombstone forever
            if gstate.exists:
                gstate.remove()
        else:
            gstate.update(
                (pickle.dumps({"docs": docs, "wm_us": max(prev_wm_us, wm_us)}),)
            )
            # wake at the earlier of: the next candidate pair sealing, or
            # the newest doc expiring from the window (state self-cleans
            # in a continuous deployment, not just under AvailableNow)
            cleanup_us = max(v[0] for v in docs.values()) + window_us
            t_us = (
                min(next_seal_us, cleanup_us)
                if next_seal_us is not None
                else cleanup_us
            )
            # Spark fires an event-time timer on timeoutTimestamp <
            # watermark (STRICT), and a doc at t_us seals at the first
            # ms watermark wm with wm*1000 > t_us, i.e. floor(t_us/1000)
            # + 1 — so the timer must sit at floor(t_us/1000) to fire in
            # that same batch.  The old floor+1 was one watermark tick
            # late: a final watermark landing exactly on the sealing
            # tick (reachable with sub-ms event times; r13 ADVICE)
            # sealed the doc but never fired the timer, dropping a pair
            # under AvailableNow.  Firing EARLY is safe — the handler
            # finds the doc unsealed and just re-registers.  Residual
            # (unavoidable: setTimeoutTimestamp requires a value past
            # the current watermark): if registration happens with the
            # watermark already inside t_us's own millisecond, the clamp
            # forces the sealing tick itself and the fire is one tick
            # late again — second-or-coarser event times never hit this.
            gstate.setTimeoutTimestamp(
                max(t_us // 1000, gstate.getCurrentWatermarkMs() + 1)
            )
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["doc_id_1", "doc_id_2", "jaccard"]
            )

    # route ONLY the verification payload through the 16-band explode:
    # in signature mode the shingle sets never leave the projection —
    # the state/shuffle shrink is real, not just a state-side trim
    exploded = sdf.select(
        id_col,
        ts_col,
        payload_col,
        "bands",
        F.posexplode("bands").alias("band", "bucket"),
    )
    return exploded.groupBy("band", "bucket").applyInPandasWithState(
        handle,
        outputStructType="doc_id_1 long, doc_id_2 long, jaccard double",
        stateStructType="blob binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
