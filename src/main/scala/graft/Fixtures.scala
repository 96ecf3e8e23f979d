package graft

import graft.model._
import graft.model.FactColumnKind._
import graft.model.Nullable._
import graft.model.TableConstraint._

/** Declared models over the driver testdata (FIXTURES.md §B) and the
  * reference's own doctest fixture (§A, for derivation golden tests).
  */
object Fixtures {

  // ---------------------------------------------------------------- B1
  /** Minimum end-to-end slice (SURVEY §7.2): fact `event` over the
    * `events` table. Some columns are declared nullable (even though
    * the synthetic data has no nulls) so the coalesce-default paths are
    * exercised. */
  val eventsTables: Seq[Table] = Seq(
    Table(
      "events",
      Seq(
        Column("event_id", "bigint", NotNull),
        Column("ts", "timestamp without time zone", NotNull),
        Column("user_id", "bigint", Null),
        Column("event_type", "text", Null),
        // numeric => exact decimal aggregation (deterministic sums at
        // any parallelism); parquet doubles are cast on read
        Column("value", "numeric(18,6)", Null),
        Column("props", "text", Null)
      ),
      Seq(PrimaryKey("event_id"))
    ))

  val eventsFacts: Seq[Fact] = Seq(
    Fact(
      name = "event",
      tableName = "events",
      columns = Seq(
        FactColumn("ts", DimTime),
        FactColumn("user_id", NoDimId),
        FactColumn("event_type", DimVal("event_type")),
        FactColumn("event_count", FactCount(None)),
        FactColumn("value_sum", FactSum("value")),
        FactColumn("value_avg", FactAverage("value")),
        FactColumn("value_max", FactMax("value")),
        FactColumn("value_min", FactMin("value")),
        FactColumn("user_count", FactCountDistinct(Some("user_id")))
      )
    ),
    // second fact over the same source: derives dim_app_user (a
    // higher-cardinality dim whose membership grows over time — used by
    // the incremental dim-load tests)
    Fact(
      name = "user_activity",
      tableName = "events",
      columns = Seq(
        FactColumn("ts", DimTime),
        FactColumn("user_id", DimVal("app_user")),
        FactColumn("activity_count", FactCount(None))
      )
    ))

  val testTypeDefaults: TypeDefaults = TypeDefaults(Map(
    "bigint"    -> "-1",
    "integer"   -> "-1",
    "double"    -> "-1",
    "numeric"   -> "-1",
    "text"      -> "'__UNKNOWN_VAL__'",
    "timestamp" -> "timestamp'1970-01-01 00:00:00'"
  ))

  val eventsSettings: Settings = Settings() // minute buckets, defaults

  lazy val eventsEnv: Env =
    Validator
      .validateEnv(eventsTables, eventsFacts, eventsSettings, testTypeDefaults)
      .fold(es => throw new IllegalStateException(s"invalid events model: $es"), identity)

  // ---------------------------------------------------------------- B2
  /** TPC-H-ish model exercising DimId targets, parent facts and the
    * parent-source LEFT OUTER join (mirrors the reference's
    * page_view/session pattern). Day buckets: ship/order dates are
    * midnight-aligned timestamps. */
  val tpchTables: Seq[Table] = Seq(
    Table(
      "orders",
      Seq(
        Column("o_orderkey", "bigint", NotNull),
        Column("o_custkey", "bigint", NotNull),
        Column("o_orderstatus", "text", Null),
        Column("o_totalprice", "numeric(18,6)", Null),
        Column("o_orderdate", "timestamp without time zone", NotNull),
        Column("o_orderpriority", "text", Null)
      ),
      Seq(PrimaryKey("o_orderkey"), ForeignKey("customer", Seq("o_custkey" -> "c_custkey")))
    ),
    Table(
      "lineitem",
      Seq(
        Column("l_orderkey", "bigint", NotNull),
        Column("l_partkey", "bigint", NotNull),
        Column("l_suppkey", "bigint", NotNull),
        Column("l_linenumber", "integer", NotNull),
        Column("l_quantity", "numeric(18,6)", NotNull),
        Column("l_extendedprice", "numeric(18,6)", NotNull),
        Column("l_discount", "double precision", NotNull),
        Column("l_tax", "double precision", NotNull),
        Column("l_returnflag", "text", Null),
        Column("l_linestatus", "text", Null),
        Column("l_shipdate", "timestamp without time zone", NotNull)
      ),
      Seq(ForeignKey("orders", Seq("l_orderkey" -> "o_orderkey")))
    ),
    Table(
      "customer",
      Seq(
        Column("c_custkey", "bigint", NotNull),
        Column("c_name", "text", NotNull),
        Column("c_nationkey", "integer", NotNull),
        Column("c_acctbal", "double precision", NotNull),
        Column("c_mktsegment", "text", Null)
      ),
      Seq(PrimaryKey("c_custkey"))
    )
  )

  val tpchFacts: Seq[Fact] = Seq(
    Fact(
      name = "order",
      tableName = "orders",
      columns = Seq(
        FactColumn("o_orderdate", DimTime),
        FactColumn("o_custkey", NoDimId),
        FactColumn("o_orderstatus", DimVal("order_status")),
        FactColumn("o_orderpriority", DimVal("order_priority")),
        FactColumn("order_count", FactCount(None)),
        FactColumn("total_price", FactSum("o_totalprice"))
      )
    ),
    Fact(
      name = "line",
      tableName = "lineitem",
      parentNames = Seq("order"),
      columns = Seq(
        FactColumn("l_shipdate", DimTime),
        FactColumn("l_returnflag", DimVal("line_status")),
        FactColumn("l_linestatus", DimVal("line_status")),
        FactColumn("line_count", FactCount(None)),
        FactColumn("qty", FactSum("l_quantity")),
        FactColumn("price", FactSum("l_extendedprice")),
        FactColumn("part_count", FactCountDistinct(Some("l_partkey")))
      )
    )
  )

  val tpchSettings: Settings = Settings(timeUnit = TimeUnit.Day)

  /** Variant exercising TenantId (degenerate dim + composite
    * (tenant, time) physical-design role) and FactCount(Some col). */
  val tenantFacts: Seq[Fact] = Seq(
    Fact(
      name = "order_by_tenant",
      tableName = "orders",
      columns = Seq(
        FactColumn("o_orderdate", DimTime),
        FactColumn("o_custkey", TenantId),
        FactColumn("status_count", FactCount(Some("o_orderstatus"))),
        FactColumn("max_price", FactMax("o_totalprice")),
        FactColumn("min_price", FactMin("o_totalprice"))
      )
    ))

  lazy val tenantEnv: Env =
    Validator
      .validateEnv(tpchTables, tenantFacts, tpchSettings, testTypeDefaults)
      .fold(es => throw new IllegalStateException(s"invalid tenant model: $es"), identity)

  lazy val tpchEnv: Env =
    Validator
      .validateEnv(tpchTables, tpchFacts, tpchSettings, testTypeDefaults)
      .fold(es => throw new IllegalStateException(s"invalid tpch model: $es"), identity)

  // ---------------------------------------------------------------- A
  /** The reference's doctest fixture (`src/Ringo.hs:26-140`), used for
    * derivation-layer golden tests. */
  val ringoTables: Seq[Table] = Seq(
    Table(
      "session_events",
      Seq(
        Column("id", "uuid", NotNull),
        Column("created_at", "timestamp without time zone", NotNull),
        Column("member_id", "integer", Null),
        Column("publisher_id", "integer", NotNull),
        Column("user_agent", "character varying(1024)", Null),
        Column("browser_name", "character varying(50)", Null),
        Column("os", "character varying(50)", Null),
        Column("geo_country_name", "character varying(50)", Null),
        Column("geo_city_name", "character varying(50)", Null),
        Column("geo_continent_name", "character varying(15)", Null),
        Column("geo_most_specific_subdivision_name", "character varying(100)", Null),
        Column("geo_longitude", "numeric(9,6)", Null),
        Column("geo_latitude", "numeric(9,6)", Null),
        Column("geo_time_zone", "character varying(20)", Null),
        Column("geo_postal_code", "character varying(20)", Null),
        Column("user_agent_name", "character varying(100)", Null),
        Column("user_agent_type", "character varying(15)", Null),
        Column("user_agent_device", "character varying(15)", Null),
        Column("user_agent_version", "character varying(100)", Null)
      ),
      Seq(PrimaryKey("id"))
    ),
    Table(
      "page_view_events",
      Seq(
        Column("id", "uuid", NotNull),
        Column("created_at", "timestamp without time zone", NotNull),
        Column("member_id", "integer", Null),
        Column("publisher_id", "integer", NotNull),
        Column("device_tracker_id", "uuid", Null),
        Column("session_event_id", "uuid", Null),
        Column("page_type", "character varying(20)", NotNull),
        Column("referrer", "character varying(1024)", Null),
        Column("url", "character varying(1024)", Null),
        Column("referrer_id", "integer", Null)
      ),
      Seq(
        PrimaryKey("id"),
        ForeignKey("session_events",
          Seq("session_event_id" -> "id", "publisher_id" -> "publisher_id")),
        ForeignKey("referrers", Seq("referrer_id" -> "id", "publisher_id" -> "publisher_id"))
      )
    ),
    Table(
      "referrers",
      Seq(
        Column("id", "integer", NotNull),
        Column("publisher_id", "integer", NotNull),
        Column("name", "character varying(100)", NotNull)
      ),
      Seq(PrimaryKey("id"), UniqueKey(Seq("publisher_id", "name")))
    )
  )

  val ringoFacts: Seq[Fact] = Seq(
    Fact(
      name = "session",
      tableName = "session_events",
      columns = Seq(
        FactColumn("created_at", DimTime),
        FactColumn("publisher_id", NoDimId),
        FactColumn("browser_name", DimVal("user_agent")),
        FactColumn("os", DimVal("user_agent")),
        FactColumn("user_agent_name", DimVal("user_agent")),
        FactColumn("geo_country_name", DimVal("geo")),
        FactColumn("geo_city_name", DimVal("geo")),
        FactColumn("geo_continent_name", DimVal("geo")),
        FactColumn("session_count", FactCount(None))
      )
    ),
    Fact(
      name = "page_view",
      tableName = "page_view_events",
      parentNames = Seq("session"),
      columns = Seq(
        FactColumn("created_at", DimTime),
        FactColumn("publisher_id", NoDimId),
        FactColumn("page_type", DimVal("page_type")),
        FactColumn("referrer_id", DimId("referrers")),
        FactColumn("view_count", FactCount(None))
      )
    )
  )

  val ringoTypeDefaults: TypeDefaults = TypeDefaults(Map(
    "integer"   -> "-1",
    "timestamp" -> "'00-00-00 00:00:00'",
    "character" -> "'__UNKNOWN_VAL__'",
    "uuid"      -> "'00000000-0000-0000-0000-000000000000'::uuid",
    "boolean"   -> "false",
    "json"      -> "'{}'::json",
    "numeric"   -> "-1",
    "text"      -> "'__UNKNOWN_VAL__'"
  ))

  val ringoSettings: Settings = Settings(tableNameSuffixTemplate = "")

  lazy val ringoEnv: Env =
    Validator
      .validateEnv(ringoTables, ringoFacts, ringoSettings, ringoTypeDefaults)
      .fold(es => throw new IllegalStateException(s"invalid ringo model: $es"), identity)
}
