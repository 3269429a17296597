"""S4: remote PubTator fetch as a distributed source connector.

The reference fetches annotations from the public NCBI PubTator REST API
on the driver, one blocking ``requests.get`` per pmid batch
(``query_pubtator2`` download.py:561-579, ``query_pubtator2biocxml``
download.py:581-597; ConnectionErrors print-and-return-None,
download.py:573-575). The Spark-idiomatic re-expression runs the HTTP
fetches ON EXECUTORS — a pmid relation is partitioned, each partition
issues its batched GETs inside ``mapInPandas``, and failures become rows
(a quarantine relation, P10-style), never job aborts or silent Nones.

The transport is injectable (``transport: url -> body``): the default is
a stdlib ``urllib`` GET (this container has no network, so tests inject a
deterministic fake — the URL construction, batching, error capture, HTML
unescape, and downstream parse are all real and tested). Response bodies
in PubTator format feed ``parse_pubtator_lines`` (the same kernel as the
S1 file scan), so fetched documents are row-identical to scanned ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# public NCBI endpoint, as used by the reference (download.py:565-570)
PUBTATOR_EXPORT_URL = (
    "https://www.ncbi.nlm.nih.gov/research/bionlp/pubtator2/api/v1/"
    "publications/export/{fmt}?pmids={pmids}"
)


def default_transport(url: str, timeout: float = 30.0) -> str:
    """Stdlib GET; swap for any callable in tests/offline runs."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as r:
        return r.read().decode("utf-8")


# HTTP statuses worth retrying: throttling + transient server/gateway
# errors. 4xx other than 429 are permanent (bad pmids, bad URL) and
# quarantine immediately.
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def _is_retryable(exc: Exception) -> bool:
    """Transient network faults retry; permanent errors quarantine at
    once. HTTPError carries a status; URLError/timeout/connection faults
    are transport-level and always retryable."""
    try:
        from urllib.error import HTTPError, URLError
    except ImportError:  # pragma: no cover
        HTTPError = URLError = ()
    if isinstance(exc, HTTPError):
        return exc.code in RETRYABLE_STATUSES
    return isinstance(exc, (URLError, TimeoutError, ConnectionError, OSError))


def fetch_pubtator_raw(
    pmids: DataFrame,
    transport=None,
    batch_size: int = 100,
    out_format: str = "pubtator",
    unescape_html: bool = True,
    max_retries: int = 2,
    backoff_sec: float = 0.5,
    request_delay_sec: float = 0.0,
) -> DataFrame:
    """One row per HTTP request: (batch_pmids array<string>, text string,
    error string). ``pmids`` is any relation with a ``pmid`` column; each
    partition fetches its ids in ``batch_size`` chunks (the reference
    comma-joins a whole list into one URL, download.py:562-563 — capped
    here so URLs stay bounded at 10^6-pmid scale). ``unescape_html``
    mirrors the reference's escape_html branch (download.py:577-579, the
    §2.8 ``html.unescape`` surface). Errors are captured per request as
    rows — the P10 quarantine pattern — instead of the reference's
    print-and-return-None.

    Transient faults (429/5xx, timeouts, connection errors — see
    ``_is_retryable``) get ``max_retries`` bounded exponential-backoff
    retries (``backoff_sec * 2**attempt``, executor-local sleep) before
    quarantining; permanent errors quarantine immediately. Quarantined
    batches stay resubmittable via :func:`refetch`.

    ``request_delay_sec`` is the politeness knob: an executor-local sleep
    BETWEEN successive chunk GETs within a partition (not before the
    first), bounding each request stream to ~1/delay req/s against a
    shared public endpoint. Total concurrency = partitions x that rate —
    cap partitions too (see ``crawl_pubtator`` ``max_inflight``)."""
    import html as _html
    import time as _time

    tp = transport or default_transport

    def _fetch(batches):
        import pandas as pd

        # partition-scoped flag: mapInPandas splits a partition into many
        # Arrow batches, so an `i > 0` guard alone would skip the delay on
        # each batch's first chunk and burst past the ~1/delay req/s bound
        sent_any = False
        for pdf in batches:
            ids = [str(x) for x in pdf["pmid"]]
            rows = []
            for i in range(0, len(ids), batch_size):
                if request_delay_sec > 0 and sent_any:
                    _time.sleep(request_delay_sec)
                sent_any = True
                chunk = ids[i : i + batch_size]
                url = PUBTATOR_EXPORT_URL.format(fmt=out_format, pmids=",".join(chunk))
                text = err = None
                for attempt in range(max_retries + 1):
                    try:
                        text = tp(url)
                        if unescape_html:
                            # inside the try: a transport returning a
                            # non-string must quarantine, not kill the task
                            text = _html.unescape(text)
                        err = None
                        break
                    except Exception as e:  # noqa: BLE001 - quarantined as data
                        err = f"{type(e).__name__}: {e}"
                        text = None
                        if attempt < max_retries and _is_retryable(e):
                            _time.sleep(backoff_sec * (2**attempt))
                        else:
                            break
                rows.append({"batch_pmids": chunk, "text": text, "error": err})
            yield pd.DataFrame(rows, columns=["batch_pmids", "text", "error"])

    return pmids.select(F.col("pmid").cast("string")).mapInPandas(
        _fetch, "batch_pmids array<string>, text string, error string"
    )


def fetch_pubtator(
    pmids: DataFrame,
    transport=None,
    batch_size: int = 100,
    filter_mutation_types: bool = True,
    unescape_html: bool = True,
    max_retries: int = 2,
    backoff_sec: float = 0.5,
    request_delay_sec: float = 0.0,
    cache: bool = False,
    return_raw: bool = False,
):
    """Fetch + parse: returns (docs, errors). ``docs`` has the S1 scan
    schema (pmid, title, abstract, mutations) — fetched documents are
    row-identical to file-scanned ones because the response bodies feed
    the same ``parse_pubtator_lines`` kernel; ``errors`` is the
    quarantine relation of failed requests (resubmit via
    :func:`refetch`).

    ``cache=True`` persists (MEMORY_AND_DISK) and eagerly materializes
    the raw response relation: the GETs run ONCE at call time and every
    downstream action (on docs or errors, however many) reads cached
    blocks — without it, each downstream action re-evaluates the
    side-effecting fetch lineage (fine for a single-action pipeline).
    Persist, NOT ``localCheckpoint``: checkpoint blocks live on the RDD
    outside the CacheManager, so ``Dataset.unpersist`` cannot release
    them (measured on this Spark) and the full response bodies would
    pin block-manager memory until JVM cleanup. The tradeoff is that
    the fetch lineage still exists: an executor loss re-issues only the
    lost partitions' GETs (never in single-JVM local mode; MEMORY_AND_DISK
    blocks spill rather than evict under pressure). ``cache=True`` also
    eagerly checkpoints the PARSED docs/errors (small, body-free), so no
    later action can re-enter the fetch lineage — and therefore the raw
    bodies are released immediately unless ``return_raw=True`` hands the
    caller the relation (release it with ``raw.unpersist()`` when done,
    which under persist is a real release). ``return_raw=True``
    therefore implies ``cache=True`` — the handle's release contract is
    meaningless for an unpersisted relation. For multi-round workflows
    prefer :func:`crawl_pubtator`, which manages that release per
    round."""
    raw = fetch_pubtator_raw(
        pmids,
        transport=transport,
        batch_size=batch_size,
        unescape_html=unescape_html,
        max_retries=max_retries,
        backoff_sec=backoff_sec,
        request_delay_sec=request_delay_sec,
    )
    if return_raw:
        # the return_raw contract ("release with raw.unpersist()") only
        # holds for a persisted relation: an unpersisted raw would re-issue
        # the side-effecting GETs on every downstream action and its
        # unpersist() would be a no-op — so return_raw implies cache
        cache = True
    if cache:
        raw = _persist_raw(raw)
    docs, errors = _parse_raw(raw, filter_mutation_types)
    if cache:
        # checkpoint the PARSED relations (small — no response bodies):
        # downstream actions never touch the fetch lineage again, so
        # releasing raw can't cause a re-fetch
        docs = docs.localCheckpoint(eager=True)
        errors = errors.localCheckpoint(eager=True)
        if not return_raw:
            # no handle returned -> nothing would ever release the
            # bodies; they are not needed past the parse, so free now
            raw.unpersist()
    if return_raw:
        return docs, errors, raw
    return docs, errors


def _persist_raw(raw: DataFrame) -> DataFrame:
    """Cache + eagerly materialize a raw fetch relation so its GETs run
    exactly once NOW and ``raw.unpersist()`` genuinely releases the
    bodies afterwards (CacheManager persist — a ``localCheckpoint``'s
    blocks survive ``Dataset.unpersist``, measured on this Spark)."""
    from pyspark import StorageLevel

    raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    raw.count()  # materialize: downstream actions read blocks, not lineage
    return raw


def _parse_raw(raw: DataFrame, filter_mutation_types: bool) -> tuple[DataFrame, DataFrame]:
    """Split a raw fetch relation into (docs, errors) — the ONE place
    the ok/error filters, CRLF-safe line split, and PubTator parse are
    wired (fetch_pubtator and crawl_pubtator both route through it, so
    a parse fix can never apply to one path and miss the other)."""
    from bern_spark.sources.pubtator import parse_pubtator_lines

    ok = raw.where(F.col("error").isNull())
    # a proxy/server may emit CRLF line endings; bare-\n splitting would
    # leave a trailing \r corrupting the last tab field of every line
    lines = ok.select(F.explode(F.split("text", r"\r?\n")).alias("value"))
    docs = parse_pubtator_lines(lines, filter_mutation_types=filter_mutation_types)
    errors = raw.where(F.col("error").isNotNull()).select("batch_pmids", "error")
    return docs, errors


def refetch(
    errors: DataFrame,
    transport=None,
    batch_size: int = 100,
    filter_mutation_types: bool = True,
    unescape_html: bool = True,
    max_retries: int = 2,
    backoff_sec: float = 0.5,
    request_delay_sec: float = 0.0,
    cache: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Resubmit a quarantine relation (``batch_pmids``, ``error``) from a
    previous :func:`fetch_pubtator` run: flattens the failed batches back
    to a pmid relation and fetches again — a real crawl loops
    ``docs, errs = refetch(errs)`` until ``errs`` is empty or stable
    (or uses :func:`crawl_pubtator`, which does exactly that).
    Returns (docs, errors) like :func:`fetch_pubtator`."""
    pmids = errors.select(F.explode("batch_pmids").alias("pmid")).dropDuplicates()
    return fetch_pubtator(
        pmids,
        transport=transport,
        batch_size=batch_size,
        filter_mutation_types=filter_mutation_types,
        unescape_html=unescape_html,
        max_retries=max_retries,
        backoff_sec=backoff_sec,
        request_delay_sec=request_delay_sec,
        cache=cache,
    )


def crawl_pubtator(
    pmids: DataFrame,
    transport=None,
    batch_size: int = 100,
    rounds: int = 3,
    max_inflight: int | None = None,
    round_delay_sec: float = 0.0,
    **fetch_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """The full crawl loop: fetch, then resubmit quarantined batches up
    to ``rounds - 1`` more times, unioning recovered documents. Returns
    (docs, errors) where ``errors`` holds only batches still failing
    after every round — the bounded-resubmission pattern a production
    crawl runs (the reference just prints and drops, download.py:573-575).

    Politeness: ``max_inflight`` caps the number of concurrent request
    streams by coalescing each round's pmid relation to at most that many
    partitions (one in-flight GET per partition); ``round_delay_sec``
    sleeps on the driver between resubmission rounds so a retry storm
    against a throttling endpoint backs off globally, not just per
    request. Pair with ``request_delay_sec`` (forwarded to the fetch) for
    a hard per-stream rate: aggregate ~= max_inflight / request_delay_sec
    req/s. Defaults keep current behavior (no cap, no delay).

    Memory + exactly-once contract: each round's raw HTTP response
    relation is persisted (MEMORY_AND_DISK) and eagerly materialized —
    the GETs run once at that materialization and the docs/errs jobs
    read cached blocks (MEMORY_AND_DISK spills under pressure instead of
    evicting; only an executor loss re-issues the lost partitions' GETs,
    never in single-JVM local mode). The round's PARSED docs and
    quarantine rows (the actual results, small) are then checkpointed
    and the raw bodies released with a REAL unpersist (persist, not
    ``localCheckpoint``, precisely so the release works) — response
    bodies never outlive their round and no cached relation leaks past
    the call. Rounds are bounded driver-side jobs, not an unbounded
    recursive plan."""
    filter_mut = fetch_kwargs.pop("filter_mutation_types", True)
    fetch_kwargs.pop("cache", None)  # superseded by per-round checkpoints
    fetch_kwargs.pop("return_raw", None)

    def _round(ids_df: DataFrame) -> tuple[DataFrame, DataFrame]:
        if max_inflight is not None:
            # coalesce, not repartition: narrowing needs no shuffle and a
            # pmid relation is tiny relative to the fetch it gates
            ids_df = ids_df.coalesce(max(1, max_inflight))
        # persist + materialize raw FIRST: the GETs run once here and the
        # docs/errs jobs below read cached blocks, not the fetch plan
        # (persist, not localCheckpoint, so the unpersist below actually
        # frees the bodies — checkpoint blocks outlive Dataset.unpersist)
        raw = _persist_raw(
            fetch_pubtator_raw(
                ids_df, transport=transport, batch_size=batch_size, **fetch_kwargs
            )
        )
        docs, errs = _parse_raw(raw, filter_mut)
        docs = docs.localCheckpoint(eager=True)
        errs = errs.localCheckpoint(eager=True)
        raw.unpersist()
        return docs, errs

    import time as _time

    docs, errors = _round(pmids)
    for _ in range(max(0, rounds - 1)):
        # isEmpty on an already-checkpointed tiny relation: one cheap
        # driver action per round, bounded by `rounds`
        if errors.isEmpty():
            break
        if round_delay_sec > 0:
            _time.sleep(round_delay_sec)
        ids = errors.select(F.explode("batch_pmids").alias("pmid")).dropDuplicates()
        more, errors = _round(ids)
        docs = docs.unionByName(more)
    return docs, errors
