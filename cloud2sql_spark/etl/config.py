"""Config surface (reference A1: configure(), cloud2sql/collect.py:74-151;
A13: db_string_from_config, cloud2sql/util.py:22-87; template
config-template.yaml).

Same YAML shape as the reference: top-level ``sources`` and
``destinations``; file-ish destinations (``file``/``s3``/``gcs``) normalize
to an arrow-output config (format parquet|csv, batch_size default 100_000 —
reference collect.py:103); SQL-ish destinations normalize to a JDBC URL.
"""

from __future__ import annotations

from dataclasses import dataclass

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


class ConfigError(ValueError):
    pass


@dataclass
class FileDestination:
    path: str
    format: str = "parquet"  # parquet | csv (reference collect.py:90-93)
    batch_size: int = 100_000


@dataclass
class JdbcDestination:
    url: str
    batch_size: int = 100_000


# reference dialect aliasing (util.py:22-87: mysql->pymysql etc.); here the
# SQLAlchemy scheme maps to a JDBC scheme
_JDBC_SCHEMES = {
    "sqlite": "jdbc:sqlite",
    "postgresql": "jdbc:postgresql",
    "mysql": "jdbc:mysql",
    "mariadb": "jdbc:mariadb",
    "snowflake": "jdbc:snowflake",
    "derby": "jdbc:derby",
}

# file-backed engines take `jdbc:<scheme>:<database-path>`, not a //host URL
_FILE_DIALECTS = {"sqlite", "derby"}


def build_jdbc_url(db_type: str, d: dict) -> str:
    """Assemble a JDBC URL from the reference's destination fields —
    user/password/host/port/database/args (db_string_from_config,
    cloud2sql/util.py:22-59) — in each dialect's native URL shape.

    Network dialects: ``jdbc:<scheme>://host[:port]/database?user=..&
    password=..&k=v`` (JDBC passes credentials as properties, not
    userinfo). File dialects (sqlite, derby): ``jdbc:<scheme>:<database>``
    with extra args appended Derby-style (``;k=v``) for derby and
    query-style for sqlite.
    """
    if db_type not in _JDBC_SCHEMES:
        raise ConfigError(f"unsupported database type: {db_type}")
    scheme = _JDBC_SCHEMES[db_type]
    args = dict(d.get("args", {}))
    if db_type in _FILE_DIALECTS:
        database = d.get("database") or d.get("path")
        if not database:
            raise ConfigError(f"{db_type} destination requires 'database'")
        url = f"{scheme}:{database}"
        if db_type == "derby":
            return url + "".join(f";{k}={v}" for k, v in args.items())
        if args:
            url += "?" + "&".join(f"{k}={v}" for k, v in args.items())
        return url
    for key in ("user", "password"):
        if d.get(key):
            args.setdefault(key, d[key])
    url = f"{scheme}://"
    if d.get("host"):
        url += str(d["host"])
        if d.get("port"):
            url += f":{d['port']}"
    if d.get("database"):
        url += f"/{d['database']}"
    if args:
        url += "?" + "&".join(f"{k}={v}" for k, v in args.items())
    return url


def normalize_s3_url(url: str) -> str:
    """Normalize the accepted S3 URL shapes to ``s3a://bucket/path`` —
    Spark's native S3 scheme (reference accepts 4 shapes,
    collect.py:110-124; semantics re-derived, see queries.udx)."""
    from cloud2sql_spark.queries.udx import _S3_PATH, normalize_bucket

    bucket = normalize_bucket(url)
    path = ""
    if "//" in url:
        rest = url.split("//", 1)[1]
        if "/" in rest:
            path = rest.split("/", 1)[1]
            # Only path-style URLs (https://s3.<region>.amazonaws.com/
            # <bucket>/<key>) carry the bucket as the first path segment;
            # for s3:// and virtual-hosted shapes the whole path IS the key,
            # so a key that merely starts with the bucket name (s3://foo/
            # foo/bar) must not be stripped (ADVICE r1).
            if _S3_PATH.match(url) and (
                path == bucket or path.startswith(bucket + "/")
            ):
                path = path[len(bucket):].lstrip("/")
    return f"s3a://{bucket}/{path}".rstrip("/")


def parse_config(text: str) -> dict:
    """YAML text -> validated config dict (requires ``sources`` and
    ``destinations`` — reference collect.py:76-88)."""
    if yaml is None:
        raise ConfigError("pyyaml not available")
    cfg = yaml.safe_load(text) or {}
    if "sources" not in cfg or not cfg["sources"]:
        raise ConfigError("config requires a 'sources' section")
    if "destinations" not in cfg or not cfg["destinations"]:
        raise ConfigError("config requires a 'destinations' section")
    return cfg


def destination_from_config(cfg: dict) -> FileDestination | JdbcDestination:
    """Normalize the destinations section (reference collect.py:90-149 file
    path; util.py:22-67 SQL path)."""
    dests = cfg["destinations"]
    if "file" in dests:
        d = dests["file"]
        fmt = d.get("format", "parquet")
        if fmt not in ("parquet", "csv"):
            raise ConfigError(f"unsupported file format: {fmt}")
        return FileDestination(d["path"], fmt, d.get("batch_size", 100_000))
    if "s3" in dests:
        d = dests["s3"]
        return FileDestination(
            normalize_s3_url(d["uri"]), d.get("format", "parquet"),
            d.get("batch_size", 100_000),
        )
    if "gcs" in dests:
        d = dests["gcs"]
        uri = d["uri"]
        if uri.startswith("gs://"):
            pass
        else:
            uri = f"gs://{uri}"
        return FileDestination(uri, d.get("format", "parquet"),
                               d.get("batch_size", 100_000))
    for name, d in dests.items():
        if name in _JDBC_SCHEMES:
            if "url" in d:
                return JdbcDestination(d["url"], d.get("batch_size", 100_000))
            return JdbcDestination(
                build_jdbc_url(name, d), d.get("batch_size", 100_000)
            )
    raise ConfigError(f"no supported destination in {sorted(dests)}")


def default_config() -> str:
    """Emit a config template covering EVERY discovered source (reference
    A3: default_config() instantiates each plugin's config section,
    collect.py:37-45) — built-ins and entry-point plugins alike. Only the
    zero-config example source is active; the rest are commented
    templates the user uncommments, matching the reference's generated
    config-template.yaml shape."""
    from cloud2sql_spark.etl.pipeline import CONFIG_TEMPLATES, discover_sources

    parts = ["sources:\n"]
    for name in sorted(discover_sources()):
        parts.append(
            CONFIG_TEMPLATES.get(
                name, f"  # {name}: {{}}              # (no template provided)\n"
            )
        )
    parts.append(
        "destinations:\n"
        "  file:\n"
        "    path: /tmp/cloud2sql_spark_out\n"
        "    format: parquet\n"
        "    batch_size: 100000\n"
    )
    return "".join(parts)
