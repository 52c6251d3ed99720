"""JDBC destination dialects (reference A13: db_string_from_config +
update_db_type + check_db_driver, cloud2sql/util.py:22-87; supported-target
matrix README.md:116-178 — sqlite, postgresql, mysql, mariadb, snowflake).

The reference builds a SQLAlchemy URI, aliases mysql/mariadb to the pymysql
driver, and raises an actionable ModuleNotFoundError naming the extra to
install when the DBAPI driver is absent. The Spark re-expression: each
dialect knows its JDBC scheme, its JDBC driver class (checked against the
JVM classpath with an install hint naming the jar), how it folds unquoted
identifiers (for DatabaseMetaData lookups), whether its DDL participates in
transactions, and how to promote a staged ``tmp_<t>`` over the live ``<t>``:

- ``transactional_ddl`` dialects (Derby, PostgreSQL, SQLite): DROP live +
  RENAME tmp inside one transaction committed after ALL tables — readers
  see the whole old snapshot or the whole new one.
- MySQL/MariaDB: DDL autocommits, but ``RENAME TABLE a TO b, c TO a`` is a
  single atomic statement — per-table reader-atomic swap (live -> retired,
  tmp -> live in one statement), retired copies dropped after promote.
- Generic/Snowflake: rename live -> retired, tmp -> live as two statements;
  a reader in the gap can miss the table for an instant, but a failure
  never loses the previous snapshot (the retired copy survives until the
  post-promote drop).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class JdbcDialect:
    name: str
    # candidate JDBC driver classes (first that loads wins; Derby moved its
    # embedded driver class between major versions)
    driver_classes: tuple[str, ...]
    install_hint: str
    transactional_ddl: bool
    # how the engine folds unquoted identifiers in its catalog
    ident_case: str = "exact"  # "upper" | "lower" | "exact"
    # True when RENAME TABLE accepts multiple comma-separated renames that
    # execute atomically (MySQL family)
    atomic_multi_rename: bool = False
    # RENAME TABLE vs ALTER TABLE ... RENAME TO
    rename_table_syntax: bool = False

    def normalize_ident(self, name: str) -> str:
        if self.ident_case == "upper":
            return name.upper()
        if self.ident_case == "lower":
            return name.lower()
        return name

    def rename_sql(self, old: str, new: str) -> str:
        if self.rename_table_syntax:
            return f"RENAME TABLE {old} TO {new}"
        return f"ALTER TABLE {old} RENAME TO {new}"

    def swap_sql(
        self, name: str, live_exists: bool
    ) -> tuple[list[str], list[str]]:
        """Statements promoting ``tmp_<name>`` over ``<name>``, plus the
        retired table names to drop after ALL promotes succeed."""
        tmp, retired = f"tmp_{name}", f"retired_{name}"
        if not live_exists:
            return [self.rename_sql(tmp, name)], []
        if self.transactional_ddl:
            # drop + rename roll back together; nothing survives to retire
            return [f"DROP TABLE {name}", self.rename_sql(tmp, name)], []
        if self.atomic_multi_rename:
            return (
                [f"RENAME TABLE {name} TO {retired}, {tmp} TO {name}"],
                [retired],
            )
        return (
            [self.rename_sql(name, retired), self.rename_sql(tmp, name)],
            [retired],
        )


DIALECTS: dict[str, JdbcDialect] = {
    "derby": JdbcDialect(
        name="derby",
        driver_classes=(
            "org.apache.derby.iapi.jdbc.AutoloadedDriver",
            "org.apache.derby.jdbc.EmbeddedDriver",
        ),
        install_hint="Derby ships with Spark; check SPARK_HOME/jars.",
        transactional_ddl=True,
        ident_case="upper",
        rename_table_syntax=True,
    ),
    "postgresql": JdbcDialect(
        name="postgresql",
        driver_classes=("org.postgresql.Driver",),
        install_hint=(
            "Add the PostgreSQL JDBC jar, e.g. "
            "--packages org.postgresql:postgresql:42.7.3 "
            "or spark.jars=/path/to/postgresql.jar."
        ),
        transactional_ddl=True,
        ident_case="lower",
    ),
    "mysql": JdbcDialect(
        name="mysql",
        driver_classes=("com.mysql.cj.jdbc.Driver", "com.mysql.jdbc.Driver"),
        install_hint=(
            "Add the MySQL Connector/J jar, e.g. "
            "--packages com.mysql:mysql-connector-j:8.4.0."
        ),
        transactional_ddl=False,
        atomic_multi_rename=True,
        rename_table_syntax=True,
    ),
    "mariadb": JdbcDialect(
        name="mariadb",
        driver_classes=("org.mariadb.jdbc.Driver",),
        install_hint=(
            "Add the MariaDB Connector/J jar, e.g. "
            "--packages org.mariadb.jdbc:mariadb-java-client:3.4.1."
        ),
        transactional_ddl=False,
        atomic_multi_rename=True,
        rename_table_syntax=True,
    ),
    "sqlite": JdbcDialect(
        name="sqlite",
        driver_classes=("org.sqlite.JDBC",),
        install_hint=(
            "Add the sqlite-jdbc jar, e.g. "
            "--packages org.xerial:sqlite-jdbc:3.46.0.0."
        ),
        transactional_ddl=True,
    ),
    "snowflake": JdbcDialect(
        name="snowflake",
        driver_classes=("net.snowflake.client.jdbc.SnowflakeDriver",),
        install_hint=(
            "Add the Snowflake JDBC jar, e.g. "
            "--packages net.snowflake:snowflake-jdbc:3.16.1."
        ),
        transactional_ddl=False,  # Snowflake DDL autocommits
        ident_case="upper",
    ),
}

_GENERIC = JdbcDialect(
    name="generic",
    driver_classes=(),
    install_hint="Add the JDBC driver jar for your database to Spark's classpath.",
    transactional_ddl=False,
)


def dialect_for_url(url: str) -> JdbcDialect:
    """``jdbc:<scheme>:...`` -> dialect (generic fallback for schemes we
    have no specific knowledge of)."""
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC URL: {url}")
    scheme = url.split(":", 2)[1].lower()
    return DIALECTS.get(scheme, _GENERIC)


class MissingJdbcDriver(RuntimeError):
    """The configured destination's JDBC driver is not on Spark's
    classpath (reference check_db_driver raises ModuleNotFoundError with an
    install hint, util.py:70-87)."""


def check_jdbc_driver(spark, url: str) -> None:
    """Fail fast with an actionable message when the dialect's driver class
    cannot be loaded in Spark's JVM. No-op for the generic dialect (the
    driver may be auto-registered via SPI)."""
    dialect = dialect_for_url(url)
    if not dialect.driver_classes:
        return
    jvm = spark._jvm
    for cls in dialect.driver_classes:
        try:
            jvm.java.lang.Class.forName(cls)
            return
        except Exception:
            continue
    raise MissingJdbcDriver(
        f"The {dialect.name} JDBC driver is not installed "
        f"(none of {', '.join(dialect.driver_classes)} on the classpath). "
        + dialect.install_hint
    )
