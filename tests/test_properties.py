"""Property-based tests (hypothesis) for the pure invariants the engine's
scale design leans on. The reference has no randomized testing (SURVEY.md
§5.1); these pin the math that the differential oracle can only sample.

No SparkSession here — everything tested is deterministic driver-side
arithmetic mirrored from the query implementations.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cloud2sql_spark.etl.config import normalize_s3_url

# ---------------------------------------------------------------- simhash

N_BANDS = 11
CHUNK_BITS = 6  # must match queries/extensions.py dedup_simhash
MASK64 = (1 << 64) - 1


def _bands(sig: int) -> list[int]:
    """The band cut exactly as the query computes it (shiftrightunsigned
    over the signed BIGINT reinterpreted as unsigned)."""
    u = sig & MASK64
    return [(u >> (b * CHUNK_BITS)) & ((1 << CHUNK_BITS) - 1) for b in range(N_BANDS)]


@given(
    sig=st.integers(min_value=0, max_value=MASK64),
    flip_positions=st.sets(st.integers(min_value=0, max_value=63), max_size=10),
)
@settings(max_examples=500)
def test_simhash_band_recall_guarantee(sig, flip_positions):
    """Any pair at hamming distance <= 10 MUST share at least one band —
    the pigeonhole guarantee that makes the equality pre-join exact."""
    other = sig
    for p in flip_positions:
        other ^= 1 << p
    assert bin(sig ^ other).count("1") == len(flip_positions)
    shared = [a == b for a, b in zip(_bands(sig), _bands(other))]
    assert any(shared), (
        f"hamming {len(flip_positions)} pair shares no band: "
        f"{_bands(sig)} vs {_bands(other)}"
    )


def test_simhash_bands_cover_all_bits():
    """The 11 bands must cover every one of the 64 bits — an uncovered bit
    would let two different signatures share ALL bands."""
    covered = set()
    for b in range(N_BANDS):
        for i in range(CHUNK_BITS):
            bit = b * CHUNK_BITS + i
            if bit < 64:
                covered.add(bit)
    assert covered == set(range(64))


# ---------------------------------------------------------------- s3 urls

_BUCKET = st.from_regex(r"[a-z0-9][a-z0-9\-]{2,40}[a-z0-9]", fullmatch=True)
_PATH = st.from_regex(r"([a-z0-9]{1,8}(/[a-z0-9]{1,8}){0,3})?", fullmatch=True)


@given(bucket=_BUCKET, path=_PATH)
@settings(max_examples=200)
def test_s3_url_shapes_normalize_identically(bucket, path):
    """The reference accepts exactly these S3 URL shapes (collect.py:
    110-124: bare name, s3:// URI, virtual-host WITH region, path-style
    WITH region — region-less hosts raise there too); all must normalize
    to the same s3a://bucket/path."""
    suffix = f"/{path}" if path else ""
    shapes = [
        f"s3://{bucket}{suffix}",
        f"https://{bucket}.s3.eu-central-1.amazonaws.com{suffix}",
        f"https://s3.us-east-1.amazonaws.com/{bucket}{suffix}",
    ]
    if not path:
        shapes.append(bucket)  # bare bucket name
    normalized = {normalize_s3_url(u) for u in shapes}
    assert normalized == {f"s3a://{bucket}{suffix}".rstrip("/")}, normalized


def test_s3_key_starting_with_bucket_name_not_stripped():
    """Regression (ADVICE r1): the path-style bucket strip must not fire on
    s3:// or virtual-hosted URLs whose KEY happens to begin with the bucket
    name."""
    assert normalize_s3_url("s3://foo/foo/bar") == "s3a://foo/foo/bar"
    assert (
        normalize_s3_url("https://foo.s3.us-east-1.amazonaws.com/foo/bar")
        == "s3a://foo/foo/bar"
    )
    # path-style still strips exactly one leading bucket segment
    assert (
        normalize_s3_url("https://s3.us-east-1.amazonaws.com/foo/foo/bar")
        == "s3a://foo/foo/bar"
    )
