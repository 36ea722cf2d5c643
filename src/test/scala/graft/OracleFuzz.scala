package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded random relational-query generator for cross-engine parity
  * fuzzing (round 11, VERDICT task 3).
  *
  * The 279 oracle-green registry rows are FIXED queries; parity drift
  * in a dialect corner none of them exercises (a cast, a null-ordering
  * rule, an implicit-coercion difference) would be structurally
  * invisible to them. This generator composes random-but-seeded
  * filter / join / aggregate / having / sort-limit trees over the
  * TPC-H schema and emits BOTH sides from one AST — the Spark
  * `DataFrame` program and the equivalent DuckDB SQL — staying inside
  * the `graft.Parity` dialect rules so any mismatch is a real engine
  * or generator bug, never a known float/rounding trap:
  *
  *   - money (double) columns are summed as `floor(x*100+0.5)` cents
  *     BIGINTs, never as floats (CLAUDE.md headline rule);
  *   - money filter constants use fractions from {.0,.25,.5,.75} so
  *     the DuckDB DECIMAL literal → DOUBLE cast is exact;
  *   - timestamps are projected/aggregated through VARCHAR casts
  *     (strings-for-timestamps rule);
  *   - every sort-limit query orders by the chain's primary key —
  *     a total order, so LIMIT is deterministic on both engines;
  *   - min/max on raw doubles is allowed (no arithmetic: both engines
  *     pick the same stored bits).
  *
  * Every generated query is deterministic for a given seed, so a
  * failing seed replays exactly.
  */
object OracleFuzz {

  sealed trait Kind
  case object KeyK extends Kind // BIGINT/INT key — exact arithmetic
  case object IntK extends Kind // small int measure/dim
  case object MoneyK extends Kind // double currency — cents discipline
  final case class EnumK(values: Seq[String]) extends Kind // low-card string
  case object TsK extends Kind // timestamp — string casts only

  final case class Col2(name: String, kind: Kind)

  final case class Table(name: String, pk: Seq[String], cols: Seq[Col2])

  val lineitem: Table = Table("lineitem", Seq("l_orderkey", "l_linenumber"), Seq(
    Col2("l_orderkey", KeyK), Col2("l_partkey", KeyK), Col2("l_suppkey", KeyK),
    Col2("l_linenumber", IntK), Col2("l_quantity", MoneyK),
    Col2("l_extendedprice", MoneyK), Col2("l_discount", MoneyK),
    Col2("l_tax", MoneyK),
    Col2("l_returnflag", EnumK(Seq("A", "N", "R"))),
    Col2("l_linestatus", EnumK(Seq("F", "O"))),
    Col2("l_shipdate", TsK)))

  val orders: Table = Table("orders", Seq("o_orderkey"), Seq(
    Col2("o_orderkey", KeyK), Col2("o_custkey", KeyK),
    Col2("o_orderstatus", EnumK(Seq("F", "O", "P"))),
    Col2("o_totalprice", MoneyK), Col2("o_orderdate", TsK),
    Col2("o_orderpriority", EnumK(Seq(
      "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))))

  val customer: Table = Table("customer", Seq("c_custkey"), Seq(
    Col2("c_custkey", KeyK), Col2("c_nationkey", IntK),
    Col2("c_acctbal", MoneyK),
    Col2("c_mktsegment", EnumK(Seq(
      "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))))

  val part: Table = Table("part", Seq("p_partkey"), Seq(
    Col2("p_partkey", KeyK),
    Col2("p_brand", EnumK((1 to 25).map(i => s"Brand#$i"))),
    Col2("p_type", EnumK(Seq(
      "ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"))),
    Col2("p_size", IntK), Col2("p_retailprice", MoneyK)))

  val supplier: Table = Table("supplier", Seq("s_suppkey"), Seq(
    Col2("s_suppkey", KeyK), Col2("s_nationkey", IntK),
    Col2("s_acctbal", MoneyK)))

  val nation: Table = Table("nation", Seq("n_nationkey"), Seq(
    Col2("n_nationkey", IntK), Col2("n_name", EnumK(Nil)),
    Col2("n_regionkey", IntK)))

  val region: Table = Table("region", Seq("r_regionkey"), Seq(
    Col2("r_regionkey", IntK), Col2("r_name", EnumK(Nil))))

  /** The LLM-corpus table joins the pool too (round 11): its enum dims
    * drive group-bys and its counters get the modulo/min-max/distinct
    * treatment. `text` itself is excluded — raw-corpus string output
    * parity is covered by the fixed registry's text operators. */
  val documents: Table = Table("documents", Seq("doc_id"), Seq(
    Col2("doc_id", KeyK),
    Col2("lang", EnumK(Seq("de", "en", "es", "fr", "zh"))),
    Col2("source", EnumK((0 until 20).map(i => s"src$i"))),
    Col2("n_chars", KeyK)))

  /** Valid FK chains; the FIRST table's pk stays unique through every
    * N:1 hop, giving sort-limit queries a total order. */
  final case class Chain(tables: Seq[Table], conds: Seq[(String, String)])

  val chains: Seq[Chain] = Seq(
    Chain(Seq(lineitem), Nil),
    Chain(Seq(orders), Nil),
    Chain(Seq(customer), Nil),
    Chain(Seq(part), Nil),
    Chain(Seq(supplier), Nil),
    Chain(Seq(lineitem, orders), Seq("l_orderkey" -> "o_orderkey")),
    Chain(Seq(lineitem, part), Seq("l_partkey" -> "p_partkey")),
    Chain(Seq(lineitem, supplier), Seq("l_suppkey" -> "s_suppkey")),
    Chain(Seq(orders, customer), Seq("o_custkey" -> "c_custkey")),
    Chain(Seq(customer, nation), Seq("c_nationkey" -> "n_nationkey")),
    Chain(Seq(supplier, nation), Seq("s_nationkey" -> "n_nationkey")),
    Chain(Seq(nation, region), Seq("n_regionkey" -> "r_regionkey")),
    Chain(Seq(lineitem, orders, customer),
      Seq("l_orderkey" -> "o_orderkey", "o_custkey" -> "c_custkey")),
    Chain(Seq(orders, customer, nation),
      Seq("o_custkey" -> "c_custkey", "c_nationkey" -> "n_nationkey")),
    Chain(Seq(customer, nation, region),
      Seq("c_nationkey" -> "n_nationkey", "n_regionkey" -> "r_regionkey")),
    Chain(Seq(lineitem, part, supplier),
      Seq("l_partkey" -> "p_partkey", "l_suppkey" -> "s_suppkey")),
    Chain(Seq(documents), Nil))

  final case class FuzzQuery(name: String, sql: String,
      build: (SparkSession, String) => DataFrame)

  /** A filter as (spark condition, sql condition). */
  private final case class Pred(spark: Column, sql: String)

  private def moneyConst(r: scala.util.Random, lo: Double, hi: Double): Double = {
    val base = lo + r.nextInt(math.max(1, (hi - lo).toInt))
    math.floor(base) + Seq(0.0, 0.25, 0.5, 0.75)(r.nextInt(4))
  }

  private def predFor(r: scala.util.Random, c: Col2): Option[Pred] = c.kind match {
    case KeyK =>
      val m = 2 + r.nextInt(6); val v = r.nextInt(m)
      Some(Pred(col(c.name) % m === v, s"${c.name} % $m = $v"))
    case IntK =>
      val v = 1 + r.nextInt(40)
      if (r.nextBoolean())
        Some(Pred(col(c.name) >= v, s"${c.name} >= $v"))
      else Some(Pred(col(c.name) <= v, s"${c.name} <= $v"))
    case MoneyK =>
      val v = moneyConst(r, 0, 50000)
      val vs = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      if (r.nextBoolean())
        Some(Pred(col(c.name) >= v, s"${c.name} >= $vs"))
      else Some(Pred(col(c.name) <= v, s"${c.name} <= $vs"))
    case EnumK(vs) if vs.nonEmpty =>
      if (r.nextBoolean() || vs.size < 3) {
        val v = vs(r.nextInt(vs.size))
        Some(Pred(col(c.name) === v, s"${c.name} = '$v'"))
      } else {
        val picked = r.shuffle(vs).take(2).sorted
        Some(Pred(col(c.name).isin(picked: _*),
          s"${c.name} IN (${picked.map(v => s"'$v'").mkString(", ")})"))
      }
    case EnumK(_) => None // unknown value domain (n_name) — don't filter
    case TsK =>
      val y = 1995 + r.nextInt(6); val m = 1 + r.nextInt(12)
      val lit0 = f"$y%04d-$m%02d-01"
      if (r.nextBoolean())
        Some(Pred(col(c.name) >= lit(lit0),
          s"${c.name} >= TIMESTAMP '$lit0 00:00:00'"))
      else Some(Pred(col(c.name) < lit(lit0),
        s"${c.name} < TIMESTAMP '$lit0 00:00:00'"))
  }

  /** An output column as (spark expr, sql select item, output name);
    * both sides aliased identically (the driver's compare sorts
    * columns by name); `name` feeds the total-order ORDER BY that
    * makes every LIMIT deterministic. */
  private final case class Out(spark: Column, sql: String, name: String)

  /** Deterministic LIMIT ordering: EVERY output column, with DuckDB
    * forced to Spark's ascending null placement (Spark asc = NULLS
    * FIRST, DuckDB default = NULLS LAST). Ordering by the declared
    * "pk" alone is NOT total — the synthetic lineitem has duplicate
    * (l_orderkey, l_linenumber) pairs (caught by fuzz seeds 2/9: the
    * LIMIT cut split a tie differently per engine); with all columns
    * in the key, any remaining ties are full-row duplicates, so any
    * cut yields the same multiset. */
  private def orderSql(names: Seq[String]): String =
    names.map(n => s"$n NULLS FIRST").mkString(", ")
  private def orderCols(names: Seq[String]): Seq[Column] =
    names.map(n => col(n).asc_nulls_first)

  private def aggFor(r: scala.util.Random, c: Col2, alias: String): Option[Out] =
    c.kind match {
      case MoneyK => r.nextInt(3) match {
        case 0 => Some(Out(
          sum(floor(col(c.name) * 100 + lit(0.5)).cast("long")).as(alias),
          s"CAST(sum(CAST(floor(${c.name} * 100 + 0.5) AS BIGINT)) AS BIGINT) AS $alias",
          alias))
        case 1 => Some(Out(min(col(c.name)).as(alias),
          s"min(${c.name}) AS $alias", alias))
        case _ => Some(Out(max(col(c.name)).as(alias),
          s"max(${c.name}) AS $alias", alias))
      }
      case KeyK | IntK => r.nextInt(3) match {
        case 0 => Some(Out(countDistinct(col(c.name)).as(alias),
          s"CAST(count(DISTINCT ${c.name}) AS BIGINT) AS $alias", alias))
        case 1 => Some(Out(min(col(c.name)).as(alias),
          s"min(${c.name}) AS $alias", alias))
        case _ => Some(Out(max(col(c.name)).as(alias),
          s"max(${c.name}) AS $alias", alias))
      }
      case EnumK(_) => Some(Out(countDistinct(col(c.name)).as(alias),
        s"CAST(count(DISTINCT ${c.name}) AS BIGINT) AS $alias", alias))
      case TsK =>
        if (r.nextBoolean())
          Some(Out(min(col(c.name).cast("string")).as(alias),
            s"min(CAST(${c.name} AS VARCHAR)) AS $alias", alias))
        else Some(Out(max(col(c.name).cast("string")).as(alias),
          s"max(CAST(${c.name} AS VARCHAR)) AS $alias", alias))
    }

  /** Projection item for sort-limit mode. */
  private def projFor(c: Col2): Out = c.kind match {
    case TsK => Out(col(c.name).cast("string").as(c.name),
      s"CAST(${c.name} AS VARCHAR) AS ${c.name}", c.name)
    case _ => Out(col(c.name), c.name, c.name)
  }

  def gen(seed: Int): FuzzQuery = {
    val r = new scala.util.Random(seed)
    val chain = chains(r.nextInt(chains.size))
    val allCols = chain.tables.flatMap(_.cols)
    // 2-table chains sometimes become LEFT OUTER with a PRE-join
    // filter on the right side, so null extension genuinely occurs
    // (TPC-H FKs are complete — an unfiltered left join degenerates
    // to inner) and null-handling parity (group-by-null, null-skipping
    // aggregates, null ordering under canon) is actually exercised
    val leftJoin = chain.tables.size == 2 && r.nextInt(4) == 0
    val rightPred: Option[Pred] =
      if (leftJoin)
        r.shuffle(chain.tables(1).cols).flatMap(predFor(r, _)).headOption
      else None
    val fromSql = {
      val head = chain.tables.head.name
      val joins = chain.tables.tail.zip(chain.conds).map { case (t, (a, b)) =>
        if (leftJoin) {
          val sub = rightPred.map(p => s"(SELECT * FROM ${t.name} WHERE ${p.sql})")
            .getOrElse(t.name)
          s" LEFT JOIN $sub ${t.name} ON $a = $b"
        } else s" JOIN ${t.name} ON $a = $b"
      }.mkString
      head + joins
    }
    // 0-2 post-join filters over distinct columns (left-side only for
    // outer joins, so the null-extended rows survive to the output)
    val predSrc = if (leftJoin) chain.tables.head.cols else allCols
    val nf = r.nextInt(3)
    val preds = r.shuffle(predSrc).take(nf).flatMap(predFor(r, _))
    val whereSql =
      if (preds.isEmpty) "" else " WHERE " + preds.map(_.sql).mkString(" AND ")

    val name = f"fuzz_$seed%04d"
    // 0-11 agg, 12-16 sort-limit, 17 setop, 18 window-rank, 19 scalar,
    // 20 window-frame (running sum), 21 full-outer nullable keys,
    // 22 rollup, 23 cube, 24-25 semi/anti (round 12 — the historically
    // riskiest parity seams: frames, outer-join null extension,
    // grouping-set nulls, EXISTS/NOT-EXISTS decorrelation),
    // 26 INTERSECT/EXCEPT ALL (bag semantics), 27 [NOT] IN subquery
    // incl. a nullable inner (three-valued NOT IN), 28 correlated
    // scalar subquery (the COUNT-bug seam) — round 13, the last two
    // families where DuckDB/Spark NULL semantics diverge most.
    // 29-31 EVENT-TIME (round 14, VERDICT task 7): random-width
    // tumbling windows, sliding windows incl. width NOT a multiple of
    // the slide, and gaps-and-islands sessionization with random gap
    // thresholds — the epoch-alignment and boundary-inclusion seams
    // the fixed window queries only pin at whole-minute parameters.
    // 32-34 µs-BOUNDARY ADVERSARIAL event-time (round 15, VERDICT
    // task 6): the same three window families with event timestamps
    // REBUILT to sit exactly ON the seams — ts == window start, 1 µs
    // either side of it, consecutive gaps of exactly the session
    // threshold ± 2 µs, and slides that divide the width exactly
    // (zero remainder) — where inclusive-start/exclusive-end and
    // strict-> rules live. Modes 29-31 draw boundary hits with
    // probability ~0 from the organic sub-second µs in the data;
    // these modes force them for every row.
    // A mode whose structural guard fails falls through to
    // agg/sort-limit, exactly like modes 17-19 always have.
    val mode = r.nextInt(38)
    val isAgg = mode < 12

    if (mode == 17 && chain.tables.size == 1) {
      // set-operation shape: two filtered slices of one table composed
      // with UNION ALL / INTERSECT / EXCEPT (Spark union IS bag
      // semantics = UNION ALL; intersect/except are distinct — the
      // dialect parity under test)
      val t = chain.tables.head
      val pk = t.pk
      val extraCol = r.shuffle(t.cols.filterNot(c => pk.contains(c.name))).head
      val outs = pk.map(n => projFor(Col2(n, KeyK))) :+ projFor(extraCol)
      val p1 = t.cols.flatMap(predFor(r, _)).headOption
      val p2 = t.cols.reverse.flatMap(predFor(r, _)).headOption
      val (opName, sqlOp) = Seq(("union", "UNION ALL"), ("intersect", "INTERSECT"),
        ("except", "EXCEPT"))(r.nextInt(3))
      val limit = 10 + r.nextInt(41)
      def side(p: Option[Pred]) =
        s"SELECT ${outs.map(_.sql).mkString(", ")} FROM ${t.name}" +
          p.map(x => s" WHERE ${x.sql}").getOrElse("")
      val ord = outs.map(_.name)
      val sql = s"SELECT * FROM (${side(p1)} $sqlOp ${side(p2)})" +
        s" ORDER BY ${orderSql(ord)} LIMIT $limit"
      return FuzzQuery(name, sql, (spark, dir) => {
        val base = spark.read.parquet(s"$dir/${t.name}.parquet")
        def slice(p: Option[Pred]) = {
          val f = p.map(x => base.filter(x.spark)).getOrElse(base)
          f.select(outs.map(_.spark): _*)
        }
        val composed = opName match {
          case "union" => slice(p1).union(slice(p2))
          case "intersect" => slice(p1).intersect(slice(p2))
          case _ => slice(p1).except(slice(p2))
        }
        composed.orderBy(orderCols(ord): _*).limit(limit)
      })
    }

    if (mode == 18 && chain.tables.size == 1) {
      // window shape: row_number per enum partition ordered by the pk
      // (a total order, so ranks are deterministic on both engines)
      val t = chain.tables.head
      val pk = t.pk
      val enums = t.cols.collect { case c @ Col2(_, EnumK(_)) => c }
      if (enums.nonEmpty) {
        val g = enums(r.nextInt(enums.size)).name
        val limit = 10 + r.nextInt(41)
        // rn joins the final ordering: pk ties inside a partition get
        // arbitrary-but-content-identical ranks, and ordering by rn
        // last makes the LIMIT cut deterministic across engines
        val ord = pk ++ Seq(g, "rn")
        val sql = s"SELECT ${pk.mkString(", ")}, $g," +
          s" CAST(row_number() OVER (PARTITION BY $g ORDER BY ${pk.mkString(", ")})" +
          s" AS BIGINT) AS rn" +
          s" FROM ${t.name}$whereSql ORDER BY ${orderSql(ord)} LIMIT $limit"
        return FuzzQuery(name, sql, (spark, dir) => {
          import org.apache.spark.sql.expressions.Window
          var df = spark.read.parquet(s"$dir/${t.name}.parquet")
          preds.foreach(p => df = df.filter(p.spark))
          df.select((pk.map(col) :+ col(g)) :+
              row_number().over(Window.partitionBy(col(g))
                .orderBy(pk.map(col): _*)).cast("long").as("rn"): _*)
            .orderBy(orderCols(ord): _*).limit(limit)
        })
      }
    }

    if (mode == 19 && chain.tables.size == 1) {
      // scalar-function projection shape: string/arithmetic scalars
      // whose cross-engine parity is exact
      val t = chain.tables.head
      val pk = t.pk
      val enums = t.cols.collect { case c @ Col2(_, EnumK(_)) => c }
      val keys = t.cols.filter(c => c.kind == KeyK || c.kind == IntK)
      val limit = 10 + r.nextInt(41)
      val items = scala.collection.mutable.ArrayBuffer.empty[Out]
      if (enums.nonEmpty) {
        val e = enums(r.nextInt(enums.size)).name
        items += Out(lower(col(e)).as("s0"), s"lower($e) AS s0", "s0")
        items += Out(substring(col(e), 1, 3).as("s1"), s"substr($e, 1, 3) AS s1", "s1")
        items += Out(length(col(e)).cast("long").as("s2"),
          s"CAST(length($e) AS BIGINT) AS s2", "s2")
      }
      if (keys.nonEmpty) {
        val k = keys(r.nextInt(keys.size)).name
        val m = 3 + r.nextInt(7)
        items += Out((col(k) % m).cast("long").as("s3"),
          s"CAST($k % $m AS BIGINT) AS s3", "s3")
        items += Out(concat_ws(":", pk.map(col): _*).as("s4"),
          s"concat_ws(':', ${pk.mkString(", ")}) AS s4", "s4")
      }
      val outs = pk.map(n => projFor(Col2(n, KeyK))) ++ items
      val ord = outs.map(_.name)
      val sql = s"SELECT ${outs.map(_.sql).mkString(", ")} FROM ${t.name}" +
        s"$whereSql ORDER BY ${orderSql(ord)} LIMIT $limit"
      return FuzzQuery(name, sql, (spark, dir) => {
        var df = spark.read.parquet(s"$dir/${t.name}.parquet")
        preds.foreach(p => df = df.filter(p.spark))
        df.select(outs.map(_.spark): _*)
          .orderBy(orderCols(ord): _*).limit(limit)
      })
    }

    if (mode == 20 && chain.tables.size == 1) {
      // window-FRAME shape: running cents sum per enum partition over
      // the pk order. The frame is deliberately the DEFAULT (RANGE
      // UNBOUNDED PRECEDING .. CURRENT ROW) on both engines: with a
      // ROWS frame, pk ties (the synthetic lineitem has duplicate pk
      // pairs!) would get order-dependent running sums; RANGE gives
      // every peer the same value, so tied rows are full-row
      // duplicates and the LIMIT cut stays deterministic. The sum is
      // exact-integer cents, so any mismatch is frame semantics, not
      // float noise.
      val t = chain.tables.head
      val enums = t.cols.collect { case c @ Col2(_, EnumK(vs)) if vs.nonEmpty => c }
      val moneys = t.cols.filter(_.kind == MoneyK)
      if (enums.nonEmpty && moneys.nonEmpty) {
        val g = enums(r.nextInt(enums.size)).name
        val m = moneys(r.nextInt(moneys.size)).name
        val pk = t.pk
        val limit = 10 + r.nextInt(41)
        val ord = pk ++ Seq(g, "rs")
        val sql = s"SELECT ${pk.mkString(", ")}, $g," +
          s" CAST(sum(CAST(floor($m * 100 + 0.5) AS BIGINT))" +
          s" OVER (PARTITION BY $g ORDER BY ${pk.mkString(", ")}) AS BIGINT) AS rs" +
          s" FROM ${t.name}$whereSql ORDER BY ${orderSql(ord)} LIMIT $limit"
        return FuzzQuery(name, sql, (spark, dir) => {
          import org.apache.spark.sql.expressions.Window
          var df = spark.read.parquet(s"$dir/${t.name}.parquet")
          preds.foreach(p => df = df.filter(p.spark))
          df.select((pk.map(col) :+ col(g)) :+
              sum(floor(col(m) * 100 + lit(0.5)).cast("long"))
                .over(Window.partitionBy(col(g)).orderBy(pk.map(col): _*))
                .cast("long").as("rs"): _*)
            .orderBy(orderCols(ord): _*).limit(limit)
        })
      }
    }

    if (mode == 21 && chain.tables.size == 2) {
      // FULL OUTER with null-extended keys: both sides pre-filtered so
      // null extension occurs in BOTH directions, join keys projected
      // raw (each nullable in the opposite side's extension rows) —
      // the null-ordering + null-group seam outer joins expose.
      val tL = chain.tables.head
      val tR = chain.tables(1)
      val (a, b) = chain.conds.head
      val pL = r.shuffle(tL.cols).flatMap(predFor(r, _)).headOption
      val pR = r.shuffle(tR.cols).flatMap(predFor(r, _)).headOption
      val eL = r.shuffle(tL.cols.filterNot(_.name == a)).head
      val eR = r.shuffle(tR.cols.filterNot(_.name == b)).head
      val keyOuts = Seq(Out(col(a), a, a), Out(col(b), b, b))
      val outs = keyOuts ++ Seq(projFor(eL), projFor(eR))
      val limit = 10 + r.nextInt(41)
      val ord = outs.map(_.name)
      def side(t: Table, p: Option[Pred]) =
        p.map(x => s"(SELECT * FROM ${t.name} WHERE ${x.sql}) ${t.name}")
          .getOrElse(t.name)
      val sql = s"SELECT ${outs.map(_.sql).mkString(", ")}" +
        s" FROM ${side(tL, pL)} FULL JOIN ${side(tR, pR)} ON $a = $b" +
        s" ORDER BY ${orderSql(ord)} LIMIT $limit"
      return FuzzQuery(name, sql, (spark, dir) => {
        var dfL = spark.read.parquet(s"$dir/${tL.name}.parquet")
        pL.foreach(p => dfL = dfL.filter(p.spark))
        var dfR = spark.read.parquet(s"$dir/${tR.name}.parquet")
        pR.foreach(p => dfR = dfR.filter(p.spark))
        dfL.join(dfR, col(a) === col(b), "full")
          .select(outs.map(_.spark): _*)
          .orderBy(orderCols(ord): _*).limit(limit)
      })
    }

    if ((mode == 22 || mode == 23) && {
      val dims = allCols.filter {
        case Col2(_, EnumK(_)) => true
        case Col2(n, IntK) => n.endsWith("nationkey") || n.endsWith("regionkey")
        case _ => false
      }
      dims.size >= 2 && allCols.exists(_.kind == MoneyK)
    }) {
      // GROUPING-SETS shape: rollup/cube over two dims with exact
      // aggregates plus the GROUPING flags — super-aggregate rows put
      // NULLs in the grouping columns, exercising null-group identity
      // and the flag encoding on both engines.
      //
      // Dialect rule found BY this production (seed 70, round 12):
      // over EMPTY input, DuckDB emits the standard's grand-total ()
      // row (cnt=0) while Spark's rollup/cube emit nothing. The
      // HAVING cnt > 0 below pins the Spark semantics — it can only
      // ever drop that empty-input artifact, since every real grouped
      // row has cnt >= 1.
      val dims = r.shuffle(allCols.filter {
        case Col2(_, EnumK(_)) => true
        case Col2(n, IntK) => n.endsWith("nationkey") || n.endsWith("regionkey")
        case _ => false
      }).take(2).map(_.name)
      val moneys = allCols.filter(_.kind == MoneyK)
      val m = moneys(r.nextInt(moneys.size)).name
      val (opName, sqlOp) =
        if (mode == 22) ("rollup", "ROLLUP") else ("cube", "CUBE")
      val sql = s"SELECT ${dims.mkString(", ")}," +
        dims.zipWithIndex.map { case (d, i) =>
          s" CAST(GROUPING($d) AS BIGINT) AS gf$i" }.mkString(",") + "," +
        s" CAST(count(*) AS BIGINT) AS cnt," +
        s" CAST(sum(CAST(floor($m * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents" +
        s" FROM $fromSql$whereSql GROUP BY $sqlOp(${dims.mkString(", ")})" +
        s" HAVING count(*) > 0"
      return FuzzQuery(name, sql, (spark, dir) => {
        var df = joined(spark, dir, chain, leftJoin, rightPred)
        preds.foreach(p => df = df.filter(p.spark))
        val base = if (opName == "rollup") df.rollup(dims.map(col): _*)
          else df.cube(dims.map(col): _*)
        base.agg(
          grouping(col(dims.head)).cast("long").as("gf0"),
          grouping(col(dims(1))).cast("long").as("gf1"),
          count(lit(1)).as("cnt"),
          sum(floor(col(m) * 100 + lit(0.5)).cast("long")).cast("long").as("cents"))
      })
    }

    if ((mode == 24 || mode == 25) && chain.tables.size == 2) {
      // SEMI/ANTI shape: the left table filtered by (NOT) EXISTS of a
      // filtered right side — Catalyst's EXISTS decorrelation into
      // LeftSemi/LeftAnti vs DuckDB's native semi join. NOT EXISTS is
      // used rather than NOT IN deliberately: NOT IN's three-valued
      // null semantics are a trap for USERS, not an engine seam, and
      // the FK columns here are non-null anyway.
      val tL = chain.tables.head
      val tR = chain.tables(1)
      val (a, b) = chain.conds.head
      // own predicates (NOT the shared whereSql/preds: those may
      // reference right-table columns, which are out of scope for the
      // outer query of an EXISTS shape)
      val pL = r.shuffle(tL.cols).flatMap(predFor(r, _)).headOption
      val pR = r.shuffle(tR.cols).flatMap(predFor(r, _)).headOption
      val anti = mode == 25
      val outs = tL.pk.map(n => projFor(Col2(n, KeyK))) ++
        r.shuffle(tL.cols.filterNot(c => tL.pk.contains(c.name)))
          .take(1 + r.nextInt(2)).map(projFor)
      val limit = 10 + r.nextInt(41)
      val ord = outs.map(_.name)
      val rightWhere = pR.map(p => s" WHERE ${p.sql}").getOrElse("")
      val not = if (anti) "NOT " else ""
      val sql = s"SELECT ${outs.map(_.sql).mkString(", ")} FROM ${tL.name}" +
        pL.map(p => s" WHERE ${p.sql} AND ").getOrElse(" WHERE ") +
        s"${not}EXISTS (SELECT 1 FROM (SELECT * FROM ${tR.name}$rightWhere) " +
        s"${tR.name} WHERE $b = ${tL.name}.$a)" +
        s" ORDER BY ${orderSql(ord)} LIMIT $limit"
      return FuzzQuery(name, sql, (spark, dir) => {
        var dfL = spark.read.parquet(s"$dir/${tL.name}.parquet")
        pL.foreach(p => dfL = dfL.filter(p.spark))
        var dfR = spark.read.parquet(s"$dir/${tR.name}.parquet")
        pR.foreach(p => dfR = dfR.filter(p.spark))
        dfL.join(dfR, col(a) === col(b), if (anti) "left_anti" else "left_semi")
          .select(outs.map(_.spark): _*)
          .orderBy(orderCols(ord): _*).limit(limit)
      })
    }

    if (mode == 26 && chain.tables.size == 1) {
      // Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL over two
      // filtered slices of one table projected to LOW-CARDINALITY
      // columns, so multiset multiplicities genuinely differ from the
      // distinct result. Mode 17 covers the DISTINCT variants; the ALL
      // variants are a separate engine path entirely — Spark compiles
      // intersectAll/exceptAll to an aggregate over per-side counts
      // plus a replicate-rows Generate, DuckDB to a hash set-op with
      // multiplicity counters — so multiplicity bookkeeping drift
      // would be invisible to every other production.
      val t = chain.tables.head
      val enums = t.cols.collect { case c @ Col2(_, EnumK(vs)) if vs.nonEmpty => c }
      val keys = t.cols.filter(c => c.kind == KeyK || c.kind == IntK)
      if (enums.nonEmpty && keys.nonEmpty) {
        val e = enums(r.nextInt(enums.size)).name
        val k = keys(r.nextInt(keys.size)).name
        val m = 2 + r.nextInt(5)
        val outs = Seq(Out(col(e), e, e),
          Out((col(k) % m).cast("long").as("km"),
            s"CAST($k % $m AS BIGINT) AS km", "km"))
        val p1 = t.cols.flatMap(predFor(r, _)).headOption
        val p2 = t.cols.reverse.flatMap(predFor(r, _)).headOption
        val (opName, sqlOp) = Seq(("intersect_all", "INTERSECT ALL"),
          ("except_all", "EXCEPT ALL"))(r.nextInt(2))
        val limit = 10 + r.nextInt(41)
        def side(p: Option[Pred]) =
          s"SELECT ${outs.map(_.sql).mkString(", ")} FROM ${t.name}" +
            p.map(x => s" WHERE ${x.sql}").getOrElse("")
        val ord = outs.map(_.name)
        val sql = s"SELECT * FROM (${side(p1)} $sqlOp ${side(p2)})" +
          s" ORDER BY ${orderSql(ord)} LIMIT $limit"
        return FuzzQuery(name, sql, (spark, dir) => {
          val base = spark.read.parquet(s"$dir/${t.name}.parquet")
          def slice(p: Option[Pred]) = {
            val f = p.map(x => base.filter(x.spark)).getOrElse(base)
            f.select(outs.map(_.spark): _*)
          }
          val composed =
            if (opName == "intersect_all") slice(p1).intersectAll(slice(p2))
            else slice(p1).exceptAll(slice(p2))
          composed.orderBy(orderCols(ord): _*).limit(limit)
        })
      }
    }

    if ((mode == 27 || mode == 28) && chain.tables.size == 2) {
      // Subquery shapes run the SAME SQL text through spark.sql AND
      // DuckDB (temp views over the parquet on the Spark side), so the
      // engine's OWN decorrelation is under test — hand-decorrelating
      // into DataFrame joins would test this generator's translation,
      // not Spark's subquery planner. The text stays dialect-neutral:
      // no VARCHAR casts (TsK outputs excluded), % / IN / TIMESTAMP
      // literals / NULLS FIRST parse identically on both engines.
      //
      // Mode 27: [NOT] IN, including a data-dependent-NULLABLE inner
      // (CASE WHEN p THEN key END) for NOT IN — three-valued semantics
      // say ONE inner NULL empties the whole result (Spark's
      // null-aware anti join vs DuckDB's mark join).
      // Mode 28: correlated scalar subqueries — count(*) over an
      // empty correlated group must be 0, not NULL (the classic COUNT
      // bug); min/max over an empty group must be NULL.
      val tL = chain.tables.head
      val tR = chain.tables(1)
      val (a, b) = chain.conds.head
      val pL = r.shuffle(tL.cols).flatMap(predFor(r, _)).headOption
      val pR = r.shuffle(tR.cols).flatMap(predFor(r, _)).headOption
      val extras = r.shuffle(tL.cols.filterNot(c =>
        tL.pk.contains(c.name) || c.kind == TsK)).take(1 + r.nextInt(2))
      val limit = 10 + r.nextInt(41)
      val sql = if (mode == 27) {
        val anti = r.nextBoolean()
        val nullableInner = anti && r.nextBoolean()
        val innerExpr =
          if (nullableInner)
            tR.cols.flatMap(predFor(r, _)).headOption
              .map(p => s"CASE WHEN ${p.sql} THEN $b END").getOrElse(b)
          else b
        val outs = tL.pk.map(n => projFor(Col2(n, KeyK))) ++ extras.map(projFor)
        val ord = outs.map(_.name)
        val not = if (anti) "NOT " else ""
        s"SELECT ${outs.map(_.sql).mkString(", ")} FROM ${tL.name}" +
          pL.map(p => s" WHERE ${p.sql} AND ").getOrElse(" WHERE ") +
          s"$a ${not}IN (SELECT $innerExpr FROM ${tR.name}" +
          pR.map(p => s" WHERE ${p.sql}").getOrElse("") + ")" +
          s" ORDER BY ${orderSql(ord)} LIMIT $limit"
      } else {
        val aggCols = tR.cols.filter(c =>
          c.kind == KeyK || c.kind == IntK || c.kind == MoneyK)
        val ac = aggCols(r.nextInt(aggCols.size))
        val innerWhere = s" WHERE $b = ${tL.name}.$a" +
          pR.map(p => s" AND ${p.sql}").getOrElse("")
        // count(*) → 0 over empty groups (COUNT bug); min/max → NULL
        // over empty groups; min/max on raw doubles is exact (stored
        // bits, no arithmetic — header rule)
        val scSql = r.nextInt(3) match {
          case 0 =>
            s"CAST((SELECT count(*) FROM ${tR.name}$innerWhere) AS BIGINT) AS sc"
          case 1 => s"(SELECT min(${ac.name}) FROM ${tR.name}$innerWhere) AS sc"
          case _ => s"(SELECT max(${ac.name}) FROM ${tR.name}$innerWhere) AS sc"
        }
        val outs = tL.pk.map(n => projFor(Col2(n, KeyK))) ++ extras.map(projFor)
        val ord = outs.map(_.name) :+ "sc"
        s"SELECT ${outs.map(_.sql).mkString(", ")}, $scSql FROM ${tL.name}" +
          pL.map(p => s" WHERE ${p.sql}").getOrElse("") +
          s" ORDER BY ${orderSql(ord)} LIMIT $limit"
      }
      return FuzzQuery(name, sql, (spark, dir) => {
        spark.read.parquet(s"$dir/${tL.name}.parquet")
          .createOrReplaceTempView(tL.name)
        spark.read.parquet(s"$dir/${tR.name}.parquet")
          .createOrReplaceTempView(tR.name)
        spark.sql(sql)
      })
    }

    if (mode >= 29 && mode <= 37) {
      // EVENT-TIME productions over the events table (self-contained:
      // chain/preds above are ignored — they reference chain tables).
      // All boundary arithmetic is exact integer MICROSECONDS on both
      // engines: the events ts carries sub-second µs, so windows are
      // derived from epoch_us and rendered as NAIVE timestamps
      // (ts - to_microseconds(...)) — never to_timestamp, whose
      // TIMESTAMPTZ rendering is a tz trap, and never time_bucket,
      // whose 2000-01-01 origin diverges from Spark's 1970 epoch
      // alignment for widths that don't divide 946684800 s.
      val evT = Table("events", Seq("event_id"), Seq(
        Col2("event_id", KeyK), Col2("user_id", KeyK),
        Col2("event_type", EnumK(Seq("click", "error", "purchase", "signup", "view")))))
      val evPreds = r.shuffle(evT.cols).take(r.nextInt(3)).flatMap(predFor(r, _))
      val evWhere =
        if (evPreds.isEmpty) "" else " WHERE " + evPreds.map(_.sql).mkString(" AND ")
      def evDf(spark: SparkSession, dir: String): DataFrame = {
        var df = Tables.events(spark, dir)
        evPreds.foreach(p => df = df.filter(p.spark))
        df
      }
      val cents = Out(
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).cast("long").as("cents"),
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents",
        "cents")
      val cnt = Out(count(lit(1)).as("cnt"), "CAST(count(*) AS BIGINT) AS cnt", "cnt")

      if (mode == 29) {
        // Tumbling: width drawn from primes/odd seconds as well as the
        // usual round figures — Spark aligns window starts to the 1970
        // epoch for ANY width, which the oracle reproduces as
        // ts − (epoch_us(ts) % width_µs).
        val widths = Seq(7, 13, 59, 60, 61, 127, 300, 900, 3600, 5400, 7200)
        val w = widths(r.nextInt(widths.size))
        val byType = r.nextBoolean()
        val wsSql = s"ts - to_microseconds(CAST(epoch_us(ts) % ${w}000000 AS BIGINT))"
        val gCols = "window_start" +: (if (byType) Seq("event_type") else Nil)
        val sql = s"SELECT ${gCols.mkString(", ")}, ${cnt.sql}, ${cents.sql}" +
          s" FROM (SELECT *, strftime($wsSql, '%Y-%m-%d %H:%M:%S') AS window_start" +
          s" FROM events$evWhere) GROUP BY ${gCols.mkString(", ")}"
        return FuzzQuery(name, sql, (spark, dir) => {
          val gb = if (byType)
            evDf(spark, dir).groupBy(window(col("ts"), s"$w seconds").as("w"),
              col("event_type"))
          else evDf(spark, dir).groupBy(window(col("ts"), s"$w seconds").as("w"))
          gb.agg(cnt.spark, cents.spark)
            .withColumn("window_start",
              date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
            .select((gCols.map(col) ++ Seq(col("cnt"), col("cents"))): _*)
        })
      }

      if (mode == 30) {
        // Sliding: starts are aligned to the SLIDE's epoch multiples;
        // when the slide does not divide the width the per-event window
        // count varies by position, which the oracle's k-expansion
        // reproduces with the integer guard rem + k·S_µs < W_µs
        // (equivalently ts < ws + W) — Spark's own emission rule.
        val slides = Seq(120, 300, 600, 900, 1800)
        val s = slides(r.nextInt(slides.size))
        val mult = 2 + r.nextInt(3)
        val wSec = if (r.nextBoolean()) s * mult else s * mult - s / 2
        val k = (wSec + s - 1) / s
        val byType = r.nextBoolean()
        // the slide-µs constant is BIGINT-cast BEFORE multiplying by k:
        // DuckDB types bare 900000000 as INT32 and overflows at k=3
        // (found by the 500-seed sweep, seeds 194/195/259/483)
        val sUs = s"CAST(${s}000000 AS BIGINT)"
        val wsSql = "ts - to_microseconds(CAST(epoch_us(ts) % " +
          s"$sUs + $sUs * t.k AS BIGINT))"
        val gCols = "window_start" +: (if (byType) Seq("event_type") else Nil)
        val sql = s"SELECT ${gCols.mkString(", ")}, ${cnt.sql}, ${cents.sql}" +
          s" FROM (SELECT value, event_type," +
          s" strftime($wsSql, '%Y-%m-%d %H:%M:%S') AS window_start" +
          s" FROM events CROSS JOIN (SELECT unnest([${(0 until k).mkString(", ")}]) AS k) t" +
          s"${if (evWhere.isEmpty) " WHERE " else s"$evWhere AND "}" +
          s"epoch_us(ts) % $sUs + $sUs * t.k < ${wSec}000000)" +
          s" GROUP BY ${gCols.mkString(", ")}"
        return FuzzQuery(name, sql, (spark, dir) => {
          val gb = if (byType)
            evDf(spark, dir).groupBy(
              window(col("ts"), s"$wSec seconds", s"$s seconds").as("w"),
              col("event_type"))
          else evDf(spark, dir).groupBy(
            window(col("ts"), s"$wSec seconds", s"$s seconds").as("w"))
          gb.agg(cnt.spark, cents.spark)
            .withColumn("window_start",
              date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
            .select((gCols.map(col) ++ Seq(col("cnt"), col("cents"))): _*)
        })
      }

      if (mode == 32) {
        // Boundary-adversarial tumbling: snap each event's timestamp
        // to EXACTLY a window start (off 0), 1 µs after it, or 1 µs
        // before the NEXT start (off W−1) — the inclusive-start /
        // exclusive-end seam itself. Spark's native window() must bin
        // an event at exactly k·W into window k; the oracle reproduces
        // the rule with pure integer µs arithmetic on the same snapped
        // values (all width constants BIGINT-cast — the INT32 lesson).
        val widths = Seq(7, 13, 59, 60, 61, 127, 300, 900, 3600, 5400, 7200)
        val w = widths(r.nextInt(widths.size))
        val wUs = s"CAST(${w}000000 AS BIGINT)"
        val offSql = s"CASE event_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE $wUs - 1 END"
        val byType = r.nextBoolean()
        val gCols = "window_start" +: (if (byType) Seq("event_type") else Nil)
        val sql = s"SELECT ${gCols.mkString(", ")}, ${cnt.sql}, ${cents.sql}" +
          s" FROM (SELECT value, event_type," +
          s" strftime(make_timestamp(CAST(us2 - us2 % $wUs AS BIGINT))," +
          s" '%Y-%m-%d %H:%M:%S') AS window_start" +
          s" FROM (SELECT *, CAST(epoch_us(ts) - epoch_us(ts) % $wUs + $offSql" +
          s" AS BIGINT) AS us2 FROM events$evWhere))" +
          s" GROUP BY ${gCols.mkString(", ")}"
        return FuzzQuery(name, sql, (spark, dir) => {
          val wUsL = w * 1000000L
          val off = when(col("event_id") % 3 === 0, lit(0L))
            .when(col("event_id") % 3 === 1, lit(1L))
            .otherwise(lit(wUsL - 1))
          val snapped = evDf(spark, dir).withColumn("ts2",
            timestamp_micros(
              unix_micros(col("ts")) - unix_micros(col("ts")) % wUsL + off))
          val gb = if (byType)
            snapped.groupBy(window(col("ts2"), s"$w seconds").as("w"),
              col("event_type"))
          else snapped.groupBy(window(col("ts2"), s"$w seconds").as("w"))
          gb.agg(cnt.spark, cents.spark)
            .withColumn("window_start",
              date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
            .select((gCols.map(col) ++ Seq(col("cnt"), col("cents"))): _*)
        })
      }

      if (mode == 33) {
        // gap == threshold seam: rebuild each user's timeline with
        // consecutive gaps of EXACTLY the threshold ± 2 µs (each
        // event jitters −1/0/+1 µs off its rank·G slot, so adjacent
        // deltas land in {G−2µs … G+2µs}) — the strict `> G` rule
        // must keep the == case IN-session on both engines, and
        // ± 1-2 µs must split/keep accordingly. session_start is
        // emitted as raw µs so no timestamp rendering can mask a
        // 1 µs divergence.
        val gaps = Seq(60, 300, 900, 1800, 3600)
        val g = gaps(r.nextInt(gaps.size))
        val gUs = s"CAST(${g}000000 AS BIGINT)"
        val sql =
          s"""WITH b AS (
             |  SELECT user_id, event_id, value,
             |   CAST(CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS BIGINT) * $gUs
             |     + event_id % 3 - 1 AS BIGINT) AS us2
             |  FROM events$evWhere),
             | x AS (
             |  SELECT user_id, event_id, value, us2,
             |   CASE WHEN us2 - lag(us2) OVER (PARTITION BY user_id
             |      ORDER BY us2, event_id) > $gUs
             |    THEN 1 ELSE 0 END AS newsess
             |  FROM b),
             | y AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id
             |   ORDER BY us2, event_id
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM x)
             |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
             | CAST(min(us2) AS BIGINT) AS session_start_us, ${cnt.sql}, ${cents.sql}
             |FROM y GROUP BY user_id, sess_id""".stripMargin
        return FuzzQuery(name, sql, (spark, dir) => {
          import org.apache.spark.sql.expressions.Window
          val byOrig = Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))
          val byUs2 = Window.partitionBy(col("user_id"))
            .orderBy(col("us2"), col("event_id"))
          val run = byUs2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val gUsL = g * 1000000L
          evDf(spark, dir)
            .withColumn("us2",
              row_number().over(byOrig).cast("long") * gUsL +
                col("event_id") % 3 - 1)
            .withColumn("newsess",
              when(col("us2") - lag(col("us2"), 1).over(byUs2) > gUsL, 1L)
                .otherwise(0L))
            .withColumn("sess_id", sum(col("newsess")).over(run))
            .groupBy(col("user_id"), col("sess_id"))
            .agg(min(col("us2")).cast("long").as("session_start_us"),
              cnt.spark, cents.spark)
        })
      }

      if (mode == 34) {
        // Sliding with ZERO width-remainder (W = mult·S exactly) and
        // slide-boundary-snapped events (rem ∈ {0, 1, S−1} µs): the
        // per-event emission count rem + k·S_µs < W_µs sits exactly at
        // the seam — an event AT a slide multiple must appear in
        // exactly `mult` windows, 1 µs before the next multiple too,
        // each with the right start set.
        val slides = Seq(120, 300, 600, 900, 1800)
        val s = slides(r.nextInt(slides.size))
        val mult = 2 + r.nextInt(3)
        val wSec = s * mult
        val k = mult
        val sUs = s"CAST(${s}000000 AS BIGINT)"
        val offSql = s"CASE event_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE $sUs - 1 END"
        val byType = r.nextBoolean()
        val gCols = "window_start" +: (if (byType) Seq("event_type") else Nil)
        val sql = s"SELECT ${gCols.mkString(", ")}, ${cnt.sql}, ${cents.sql}" +
          s" FROM (SELECT value, event_type," +
          s" strftime(make_timestamp(CAST(us2 - (us2 % $sUs + $sUs * t.k)" +
          s" AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS window_start" +
          s" FROM (SELECT *, CAST(epoch_us(ts) - epoch_us(ts) % $sUs + $offSql" +
          s" AS BIGINT) AS us2 FROM events$evWhere)" +
          s" CROSS JOIN (SELECT unnest([${(0 until k).mkString(", ")}]) AS k) t" +
          s" WHERE us2 % $sUs + $sUs * t.k < CAST(${wSec}000000 AS BIGINT))" +
          s" GROUP BY ${gCols.mkString(", ")}"
        return FuzzQuery(name, sql, (spark, dir) => {
          val sUsL = s * 1000000L
          val off = when(col("event_id") % 3 === 0, lit(0L))
            .when(col("event_id") % 3 === 1, lit(1L))
            .otherwise(lit(sUsL - 1))
          val snapped = evDf(spark, dir).withColumn("ts2",
            timestamp_micros(
              unix_micros(col("ts")) - unix_micros(col("ts")) % sUsL + off))
          val gb = if (byType)
            snapped.groupBy(
              window(col("ts2"), s"$wSec seconds", s"$s seconds").as("w"),
              col("event_type"))
          else snapped.groupBy(
            window(col("ts2"), s"$wSec seconds", s"$s seconds").as("w"))
          gb.agg(cnt.spark, cents.spark)
            .withColumn("window_start",
              date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
            .select((gCols.map(col) ++ Seq(col("cnt"), col("cents"))): _*)
        })
      }

      if (mode == 35) {
        // ENRICH-THEN-WINDOW (round 16, r15 VERDICT task 7): real
        // pipelines window JOINED streams, and the composition is
        // where µs truncation meets join-key NULLs — an event whose
        // derived key is NULL must (inner) vanish or (left) survive
        // with a NULL dim attribute that then forms its own window
        // group. Key = NULLIF(user_id % m, 0) against the customer
        // dim (c_custkey 1..m−1 all exist at every SF; c_custkey is
        // unique, so the join never fans out and the window counts
        // stay event-exact). The window agg reuses the mode-29
        // epoch-aligned tumbling oracle on the ENRICHED relation.
        val widths = Seq(13, 60, 300, 900, 3600, 7200)
        val w = widths(r.nextInt(widths.size))
        val m = Seq(50, 100, 150)(r.nextInt(3))
        val leftJ = r.nextBoolean()
        val joinSql = if (leftJ) "LEFT JOIN" else "JOIN"
        val wsSql = s"ts - to_microseconds(CAST(epoch_us(ts) % ${w}000000 AS BIGINT))"
        val sql = s"SELECT window_start, seg, ${cnt.sql}, ${cents.sql}" +
          s" FROM (SELECT strftime($wsSql, '%Y-%m-%d %H:%M:%S') AS window_start," +
          s" c.c_mktsegment AS seg, value" +
          s" FROM (SELECT *, NULLIF(user_id % $m, 0) AS jk FROM events$evWhere) e" +
          s" $joinSql customer c ON e.jk = c.c_custkey)" +
          s" GROUP BY window_start, seg"
        return FuzzQuery(name, sql, (spark, dir) => {
          val e = evDf(spark, dir).withColumn("jk",
            when(col("user_id") % m === 0, lit(null).cast("long"))
              .otherwise(col("user_id") % m))
          val c = Tables.customer(spark, dir)
            .select(col("c_custkey"), col("c_mktsegment"))
          e.join(c, col("jk") === col("c_custkey"), if (leftJ) "left" else "inner")
            .groupBy(window(col("ts"), s"$w seconds").as("w"),
              col("c_mktsegment").as("seg"))
            .agg(cnt.spark, cents.spark)
            .withColumn("window_start",
              date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
            .select(col("window_start"), col("seg"), col("cnt"), col("cents"))
        })
      }

      if (mode == 36) {
        // TWO-STREAM EVENT-TIME JOIN (round 17, r16 VERDICT task 6):
        // mode 35 joined events to a STATIC dim; real pipelines join
        // two event-time relations. Split events into two typed
        // streams, self-join on user with a µs time band (r.ts in
        // (l.ts − band, l.ts], epoch_us integer arithmetic — the
        // as-of/interval shape), then the mode-29 epoch-aligned
        // tumbling window on the LEFT stream's ts. Two variants:
        // interval (all matches flow to the agg — fan-out is the
        // semantics) and AS-OF (row_number picks the latest match per
        // left event, ties pinned by r_id DESC; unmatched left rows
        // survive with NULL value — left-join semantics — so a window
        // of only-unmatched rows aggregates cents over all-NULL, which
        // both engines render as NULL). Dual-impl like modes 29-35:
        // the window/strftime tier has no dialect-neutral spelling,
        // but every boundary compare is exact integer µs on both
        // engines (band µs BIGINT-cast before multiplying — the
        // round-14 INT32-overflow rule).
        val types = r.shuffle(Seq("click", "error", "purchase", "signup", "view"))
        val (tA, tB) = (types(0), types(1))
        val band = Seq(60, 300, 900, 3600, 7201)(r.nextInt(5))
        val w = Seq(60, 300, 900, 3600, 7200)(r.nextInt(5))
        val asof = r.nextBoolean()
        val wsSql = s"lts - to_microseconds(CAST(epoch_us(lts) % ${w}000000 AS BIGINT))"
        val lSel = s"SELECT event_id AS l_id, user_id, ts AS lts FROM events" +
          s"$evWhere${if (evWhere.isEmpty) " WHERE" else " AND"} event_type = '$tA'"
        val rSel = s"SELECT event_id AS r_id, user_id, ts AS rts, value FROM events" +
          s"$evWhere${if (evWhere.isEmpty) " WHERE" else " AND"} event_type = '$tB'"
        val bandCond = s"epoch_us(l.lts) - epoch_us(r.rts)" +
          s" BETWEEN 0 AND CAST($band AS BIGINT) * 1000000"
        val sql =
          if (asof)
            s"""WITH j AS (
               |  SELECT l.l_id, l.lts, r.value,
               |   row_number() OVER (PARTITION BY l.l_id
               |     ORDER BY r.rts DESC, r.r_id DESC) AS rn
               |  FROM ($lSel) l LEFT JOIN ($rSel) r
               |   ON l.user_id = r.user_id AND $bandCond)
               |SELECT strftime($wsSql, '%Y-%m-%d %H:%M:%S') AS window_start,
               | ${cnt.sql}, ${cents.sql}
               |FROM j WHERE rn = 1 GROUP BY window_start""".stripMargin
          else
            s"""SELECT strftime($wsSql, '%Y-%m-%d %H:%M:%S') AS window_start,
               | ${cnt.sql}, ${cents.sql}
               |FROM (SELECT l.lts, r.value FROM ($lSel) l JOIN ($rSel) r
               |  ON l.user_id = r.user_id AND $bandCond)
               |GROUP BY window_start""".stripMargin
        return FuzzQuery(name, sql, (spark, dir) => {
          import org.apache.spark.sql.expressions.Window
          val ev = evDf(spark, dir)
          val l = ev.filter(col("event_type") === tA)
            .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("lts"))
          val rr = ev.filter(col("event_type") === tB)
            .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
              col("ts").as("rts"), col("value"))
          val cond = col("user_id") === col("r_user") &&
            (unix_micros(col("lts")) - unix_micros(col("rts"))).between(
              0L, band.toLong * 1000000L)
          val joined =
            if (asof) {
              val wA = Window.partitionBy(col("l_id"))
                .orderBy(col("rts").desc, col("r_id").desc)
              l.join(rr, cond, "left")
                .withColumn("rn", row_number().over(wA))
                .filter(col("rn") === 1)
            } else l.join(rr, cond)
          joined
            .groupBy(window(col("lts"), s"$w seconds").as("wd"))
            .agg(cnt.spark, cents.spark)
            .withColumn("window_start",
              date_format(col("wd.start"), "yyyy-MM-dd HH:mm:ss"))
            .select(col("window_start"), col("cnt"), col("cents"))
        })
      }

      if (mode == 37) {
        // WINDOWED AGG OVER A TWO-STREAM JOIN WITH GROUPING FLAGS
        // (round 18, r17 VERDICT task 6): mode 36's event-time join
        // composed with the mode-22/23 rollup/cube production, with
        // the µs-aligned WINDOW KEY as the first grouping dim and a
        // user-bucket as the second — the r12 empty-input dialect
        // rule (over empty input DuckDB emits the SQL-standard
        // grand-total () row, Spark emits nothing; HAVING
        // count(*) > 0 pins Spark semantics) had never met
        // epoch-aligned window starts or the as-of variant's
        // NULL-value tier (super-aggregate rows summing cents over a
        // mix of matched and unmatched-NULL rows). window_start and
        // ub are never NULL from the data side, so every NULL in a
        // grouping column is a super-row marker and the GROUPING
        // flags disambiguate exactly as in the static production.
        val types = r.shuffle(Seq("click", "error", "purchase", "signup", "view"))
        val (tA, tB) = (types(0), types(1))
        val band = Seq(60, 300, 900, 3600, 7201)(r.nextInt(5))
        val w = Seq(60, 300, 900, 3600, 7200)(r.nextInt(5))
        val asof = r.nextBoolean()
        val um = 2 + r.nextInt(4)
        val (opName, sqlOp) =
          if (r.nextBoolean()) ("rollup", "ROLLUP") else ("cube", "CUBE")
        val wsSql = s"lts - to_microseconds(CAST(epoch_us(lts) % ${w}000000 AS BIGINT))"
        val lSel = s"SELECT event_id AS l_id, user_id, ts AS lts FROM events" +
          s"$evWhere${if (evWhere.isEmpty) " WHERE" else " AND"} event_type = '$tA'"
        val rSel = s"SELECT event_id AS r_id, user_id AS r_user, ts AS rts, value" +
          s" FROM events$evWhere${if (evWhere.isEmpty) " WHERE" else " AND"}" +
          s" event_type = '$tB'"
        val bandCond = s"epoch_us(l.lts) - epoch_us(r.rts)" +
          s" BETWEEN 0 AND CAST($band AS BIGINT) * 1000000"
        val joinSql =
          if (asof)
            s"""SELECT user_id, lts, value FROM (
               |  SELECT l.user_id, l.lts, r.value,
               |   row_number() OVER (PARTITION BY l.l_id
               |     ORDER BY r.rts DESC, r.r_id DESC) AS rn
               |  FROM ($lSel) l LEFT JOIN ($rSel) r
               |   ON l.user_id = r.r_user AND $bandCond) WHERE rn = 1""".stripMargin
          else
            s"""SELECT l.user_id, l.lts, r.value FROM ($lSel) l JOIN ($rSel) r
               | ON l.user_id = r.r_user AND $bandCond""".stripMargin
        val sql =
          s"""SELECT window_start, ub,
             | CAST(GROUPING(window_start) AS BIGINT) AS gf0,
             | CAST(GROUPING(ub) AS BIGINT) AS gf1,
             | ${cnt.sql}, ${cents.sql}
             |FROM (SELECT strftime($wsSql, '%Y-%m-%d %H:%M:%S') AS window_start,
             |  CAST(user_id % $um AS BIGINT) AS ub, value FROM ($joinSql))
             |GROUP BY $sqlOp(window_start, ub) HAVING count(*) > 0""".stripMargin
        return FuzzQuery(name, sql, (spark, dir) => {
          import org.apache.spark.sql.expressions.Window
          val ev = evDf(spark, dir)
          val l = ev.filter(col("event_type") === tA)
            .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("lts"))
          val rr = ev.filter(col("event_type") === tB)
            .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
              col("ts").as("rts"), col("value"))
          val cond = col("user_id") === col("r_user") &&
            (unix_micros(col("lts")) - unix_micros(col("rts"))).between(
              0L, band.toLong * 1000000L)
          val joined =
            if (asof) {
              val wA = Window.partitionBy(col("l_id"))
                .orderBy(col("rts").desc, col("r_id").desc)
              l.join(rr, cond, "left")
                .withColumn("rn", row_number().over(wA))
                .filter(col("rn") === 1)
            } else l.join(rr, cond)
          val flat = joined
            .select(
              date_format(window(col("lts"), s"$w seconds").getField("start"),
                "yyyy-MM-dd HH:mm:ss").as("window_start"),
              (col("user_id") % um).cast("long").as("ub"), col("value"))
          val base = if (opName == "rollup")
            flat.rollup(col("window_start"), col("ub"))
          else flat.cube(col("window_start"), col("ub"))
          base.agg(
            grouping(col("window_start")).cast("long").as("gf0"),
            grouping(col("ub")).cast("long").as("gf1"),
            cnt.spark, cents.spark)
        })
      }

      // mode 31 — gaps-and-islands sessionization with a random gap:
      // lag + running sum over (ts, event_id) — the tie order the
      // fixed query pinned — then per-session aggregates. The gap
      // compare is exact integer µs on both engines.
      val gaps = Seq(60, 300, 900, 1800, 3600, 7201)
      val g = gaps(r.nextInt(gaps.size))
      val sql =
        s"""WITH x AS (
           |  SELECT user_id, ts, event_id, value,
           |   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
           |     (PARTITION BY user_id ORDER BY ts, event_id)) > ${g}000000
           |    THEN 1 ELSE 0 END AS newsess
           |  FROM events$evWhere),
           | y AS (SELECT *, sum(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM x)
           |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
           | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           | ${cnt.sql}, ${cents.sql}
           |FROM y GROUP BY user_id, sess_id""".stripMargin
      return FuzzQuery(name, sql, (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        evDf(spark, dir)
          .withColumn("newsess",
            when(unix_micros(col("ts")) -
              unix_micros(lag(col("ts"), 1).over(byUser)) > g * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("newsess")).over(run))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            cnt.spark, cents.spark)
      })
    }

    if (isAgg) {
      val groupable = allCols.filter {
        case Col2(_, EnumK(_)) => true
        case Col2(n, IntK) => n.endsWith("nationkey") || n.endsWith("regionkey") ||
          n == "p_size" || n == "l_linenumber"
        case _ => false
      }
      val gcols = r.shuffle(groupable).take(r.nextInt(3)).map(_.name)
      val aggSrc = r.shuffle(allCols.filterNot(c => gcols.contains(c.name)))
        .take(1 + r.nextInt(3))
      val aggs = Out(count(lit(1)).as("cnt"), "CAST(count(*) AS BIGINT) AS cnt", "cnt") +:
        aggSrc.zipWithIndex.flatMap { case (c, i) => aggFor(r, c, s"m$i") }
      val having = if (gcols.nonEmpty && r.nextInt(4) == 0) Some(1 + r.nextInt(5)) else None
      val gSql = if (gcols.isEmpty) "" else " GROUP BY " + gcols.mkString(", ")
      val hSql = having.map(k => s" HAVING count(*) >= $k").getOrElse("")
      val selSql = (gcols ++ aggs.map(_.sql)).mkString(", ")
      val sql = s"SELECT $selSql FROM $fromSql$whereSql$gSql$hSql"
      FuzzQuery(name, sql, (spark, dir) => {
        var df = joined(spark, dir, chain, leftJoin, rightPred)
        preds.foreach(p => df = df.filter(p.spark))
        var out =
          if (gcols.isEmpty) df.agg(aggs.head.spark, aggs.tail.map(_.spark): _*)
          else df.groupBy(gcols.map(col): _*)
            .agg(aggs.head.spark, aggs.tail.map(_.spark): _*)
        having.foreach(k => out = out.filter(col("cnt") >= k))
        out
      })
    } else {
      val pk = chain.tables.head.pk
      val extra = r.shuffle(allCols.filterNot(c => pk.contains(c.name)))
        .take(1 + r.nextInt(4))
      val outs = pk.map(n => projFor(Col2(n, KeyK))) ++ extra.map(projFor)
      val limit = 5 + r.nextInt(46)
      val ord = outs.map(_.name)
      val sql = s"SELECT ${outs.map(_.sql).mkString(", ")} FROM $fromSql$whereSql" +
        s" ORDER BY ${orderSql(ord)} LIMIT $limit"
      FuzzQuery(name, sql, (spark, dir) => {
        var df = joined(spark, dir, chain, leftJoin, rightPred)
        preds.foreach(p => df = df.filter(p.spark))
        df.select(outs.map(_.spark): _*)
          .orderBy(orderCols(ord): _*).limit(limit)
      })
    }
  }

  /** Run the given seeds end-to-end: write each shape's Spark result
    * + the oracle SQL map under `out`, then replay in DuckDB via
    * `tools/fuzz_check.py`. Returns (spark-side errors, checker exit
    * code, checker output). Shared by OracleFuzzSpec (120 seeds in
    * `sbt test`) and the on-demand deep-fuzz main
    * (`sbt "Test/runMain graft.FuzzMain <sf> <out> <from> <to>"`). */
  def runAndCheck(spark: SparkSession, sf: String, out: String,
      seeds: Range): (Seq[String], Int, String) = {
    val qs = seeds.map(gen)
    def jesc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val json = qs.map(q => s""""${q.name}": "${jesc(q.sql)}"""")
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), json.getBytes("UTF-8"))
    val errs = qs.flatMap { q =>
      try {
        q.build(spark, sf).write.mode("overwrite").parquet(s"$out/${q.name}")
        None
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getMessage}\n  sql: ${q.sql}")
      }
    }
    val sb = new StringBuilder
    import scala.sys.process._
    val code = Process(Seq("python3", "tools/fuzz_check.py", sf, out),
      new java.io.File(".")).!(ProcessLogger(l => sb.append(l).append('\n')))
    (errs, code, sb.toString)
  }

  private def joined(spark: SparkSession, dir: String, chain: Chain,
      leftJoin: Boolean = false, rightPred: Option[Pred] = None): DataFrame = {
    var df = spark.read.parquet(s"$dir/${chain.tables.head.name}.parquet")
    chain.tables.tail.zip(chain.conds).foreach { case (t, (a, b)) =>
      var rt = spark.read.parquet(s"$dir/${t.name}.parquet")
      if (leftJoin) rightPred.foreach(p => rt = rt.filter(p.spark))
      df = df.join(rt, col(a) === col(b), if (leftJoin) "left" else "inner")
    }
    df
  }
}
