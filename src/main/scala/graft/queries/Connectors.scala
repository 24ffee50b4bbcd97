package graft.queries

import graft.{Q, Tables}
import graft.sources.{Avro, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared queries for connector breadth (SURVEY §2 #9) — the reference's
  * non-parquet storage formats (`presto-hive/.../HiveStorageFormat.java:53-93`
  * lists CSV/JSON/ORC/TEXTFILE alongside PARQUET) and the csv/json record
  * decoders (`presto-record-decoder/`). Each query pushes a real table
  * through the format and back via the [[graft.sources.Sources]] readers,
  * then the DuckDB oracle re-reads THE SAME FILES with its own native
  * reader (CSV/JSON-lines) or re-derives the aggregate from the parquet
  * source (ORC — DuckDB has no ORC reader). A symmetric writer/reader bug
  * cannot survive the cross-engine file-level check, and a value that
  * doesn't survive the format roundtrip breaks the hash either way.
  *
  * Scale note: every reader here takes an EXPLICIT schema — schema
  * inference reads the whole input once just to guess types, a non-starter
  * at 100 TB (the reference engine never infers: connectors declare types,
  * SURVEY §1.1). The partitioned-CSV query additionally proves
  * hive-style directory layout + partition pruning work on a schemaless
  * format: the pruned read lists one partition directory, not the table.
  */
object Connectors {

  // Per-JVM scratch (same rationale as Ddl.scala): concurrent runs must
  // not clobber each other; the oracle runs AFTER Verify in the same
  // driver pass, so the pid-scoped path is still present for read_csv.
  private val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_src_${
    java.lang.ProcessHandle.current().pid()}"

  private def reset(dir: String): Unit = {
    def rec(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rec)
      x.delete(); ()
    }
    rec(new java.io.File(dir))
  }

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType)))

  // `escape="` makes Spark emit RFC-4180 quoting (doubled quotes) instead
  // of backslash escapes, which is what every other CSV reader — DuckDB's
  // included — expects; the space-separated timestamp format is the one
  // both engines parse identically (Spark's default writes a 'T'+zone
  // suffix DuckDB's TIMESTAMP, a zoneless type, won't take).
  private val csvOpts = Map(
    "header" -> "true", "escape" -> "\"",
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss")

  val qs: Map[String, Q] = Map(

    // CSV connector roundtrip: orders → CSV files → graft CSV reader
    // (explicit schema); the oracle re-reads the same CSV files with
    // DuckDB's native reader under the same declared types, so the check
    // is file-level and cross-engine, not a self-consistent write/read.
    "src_csv_roundtrip" -> Q.df(
      s"""SELECT * FROM read_csv('$scratch/orders_csv/*.csv', header=true,
         |  columns={'o_orderkey':'BIGINT','o_custkey':'BIGINT',
         |    'o_orderstatus':'VARCHAR','o_totalprice':'DOUBLE',
         |    'o_orderdate':'TIMESTAMP','o_orderpriority':'VARCHAR'})
         |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      reset(s"$scratch/orders_csv")
      val w = Tables.t(s, dir, "orders").write.mode("overwrite")
      csvOpts.foldLeft(w)((w, kv) => w.option(kv._1, kv._2)).csv(s"$scratch/orders_csv")
      Sources.csv(s, s"$scratch/orders_csv", ordersSchema)
        .orderBy(col("o_orderkey").asc_nulls_last)
    },

    // JSON-lines connector roundtrip (presto-record-decoder's json codec /
    // HiveStorageFormat.JSON): supplier → newline-delimited JSON → graft
    // jsonLines reader; oracle re-reads the same files via read_json.
    "src_jsonl_roundtrip" -> Q.df(
      s"""SELECT * FROM read_json('$scratch/supplier_jsonl/*.json',
         |  format='newline_delimited',
         |  columns={'s_suppkey':'BIGINT','s_name':'VARCHAR',
         |    's_nationkey':'INTEGER','s_acctbal':'DOUBLE'})
         |ORDER BY s_suppkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      reset(s"$scratch/supplier_jsonl")
      Tables.t(s, dir, "supplier").write.mode("overwrite")
        .json(s"$scratch/supplier_jsonl")
      Sources.jsonLines(s, s"$scratch/supplier_jsonl", supplierSchema)
        .orderBy(col("s_suppkey").asc_nulls_last)
    },

    // ORC connector roundtrip (HiveStorageFormat.ORC): customer → ORC →
    // graft ORC reader. DuckDB cannot read ORC, so the oracle re-derives
    // the aggregate from the parquet source — any value the format
    // mangles breaks the sum/count hash.
    "src_orc_roundtrip" -> Q.df(
      """SELECT c_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS acctbal
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      reset(s"$scratch/customer_orc")
      Tables.t(s, dir, "customer").write.mode("overwrite")
        .orc(s"$scratch/customer_orc")
      Sources.orc(s, s"$scratch/customer_orc")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          call_function("dsum8", col("c_acctbal")).as("acctbal"))
        .orderBy(col("c_nationkey").asc_nulls_last)
    },

    // Hive-style partitioned CSV + partition pruning: nation written as
    // n_regionkey=K directories, read back pruned to one partition. The
    // oracle recomputes from the parquet source; the Spark plan must
    // recover the partition column from the directory key (cast back to
    // the declared int — inference yields int32 here, but the contract is
    // the declared type, not the inferred one).
    "src_csv_partitioned_prune" -> Q.df(
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey = 2
        |ORDER BY n_nationkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      reset(s"$scratch/nation_csv")
      Sources.write(
        Tables.t(s, dir, "nation"), s"$scratch/nation_csv", "csv",
        partitionBy = Seq("n_regionkey"))
      s.read.schema(nationSchema)
        .option("basePath", s"$scratch/nation_csv")
        .csv(s"$scratch/nation_csv")
        .filter(col("n_regionkey") === 2)
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey").asc_nulls_last)
    },

    // JDBC connector roundtrip (presto-base-jdbc): customer → embedded
    // Derby (the JDBC engine already on Spark's classpath) → parallel
    // range-partitioned JDBC read (4 split predicates on c_custkey — the
    // reference's split generation) → aggregate. The oracle re-derives
    // from the parquet source, ORC-style: the in-memory Derby is invisible
    // to the oracle process, so any value the JDBC type mapping mangles
    // (or a row a split predicate drops/duplicates) breaks the hash.
    "src_jdbc_roundtrip" -> Q.df(
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS acctbal
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      // keep Derby's log out of the repo working tree
      System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
      val url = s"jdbc:derby:memory:graft_${java.lang.ProcessHandle.current().pid()};create=true"
      val cust = Tables.t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      Sources.writeJdbc(cust, url, "customer_jdbc")
      // bounded 2-scalar driver fetch — the split-bound probe every JDBC
      // engine's split generation performs; never a row-path collect
      val bounds = cust.agg(min("c_custkey"), max("c_custkey")).head()
      Sources.jdbc(s, url, "customer_jdbc", "c_custkey",
          bounds.getLong(0), bounds.getLong(1) + 1, numPartitions = 4)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          call_function("dsum8", col("c_acctbal")).as("acctbal"))
        .orderBy(col("c_nationkey").asc_nulls_last)
    },

    // Avro record-decoder roundtrip (presto-record-decoder/.../avro/
    // AvroColumnDecoder.java — the third decoder format; json and csv are
    // above): documents → Avro container files via [[graft.sources.Avro]]
    // (splittable Hadoop AvroKey framing; spark-avro is not on this
    // classpath, avro + avro-mapred are) → read back with the DECLARED
    // schema → aggregate. DuckDB has no Avro reader, so the oracle
    // re-derives from the parquet source (the ORC/JDBC pattern): any
    // value the Avro type mapping or Utf8 bridge mangles, and any row a
    // split drops or duplicates, breaks rows+hash.
    "src_avro_roundtrip" -> Q.df(
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
        |  CAST(SUM(length(text)) AS BIGINT) AS text_len_sum
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang ASC NULLS LAST, source ASC NULLS LAST""".stripMargin) { (s, dir) =>
      reset(s"$scratch/documents_avro")
      Avro.write(
        Tables.t(s, dir, "documents"), s"$scratch/documents_avro", "document")
      Avro.read(s, s"$scratch/documents_avro", StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType),
          StructField("lang", StringType),
          StructField("source", StringType),
          StructField("n_chars", LongType))), "document")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("n_chars")).cast("long").as("chars_sum"),
          sum(length(col("text"))).cast("long").as("text_len_sum"))
        .orderBy(col("lang").asc_nulls_last, col("source").asc_nulls_last)
    },

    // SequenceFile connector roundtrip (HiveStorageFormat.SEQUENCEFILE +
    // LazySimpleSerDe line framing): supplier → ctrl-A-delimited Text
    // values in a SequenceFile container → declared-schema read-back →
    // aggregate. Oracle re-derived from the parquet source (the ORC/JDBC/
    // Avro pattern): a value the serde framing mangles breaks the hash.
    "src_sequencefile_roundtrip" -> Q.df(
      """SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS acctbal,
        |  CAST(SUM(length(s_name)) AS BIGINT) AS name_len_sum
        |FROM supplier GROUP BY s_nationkey
        |ORDER BY s_nationkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      reset(s"$scratch/supplier_seq")
      Sources.writeSequenceFile(
        Tables.t(s, dir, "supplier"), s"$scratch/supplier_seq")
      Sources.sequenceFile(s, s"$scratch/supplier_seq", StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("s_name", StringType),
          StructField("s_nationkey", IntegerType),
          StructField("s_acctbal", DoubleType))))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).cast("long").as("n"),
          call_function("dsum8", col("s_acctbal")).as("acctbal"),
          sum(length(col("s_name"))).cast("long").as("name_len_sum"))
        .orderBy(col("s_nationkey").asc_nulls_last)
    },

    // RCFile connector roundtrip (HiveStorageFormat.RCTEXT: columnar row
    // groups, text-encoded fields): part → RCFile → declared-schema
    // read-back → aggregate, oracle re-derived from the parquet source.
    "src_rcfile_roundtrip" -> Q.df(
      """SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(p_size) AS BIGINT) AS size_sum,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(30,8))) AS DOUBLE) AS price_sum
        |FROM part GROUP BY p_type
        |ORDER BY p_type ASC NULLS LAST""".stripMargin) { (s, dir) =>
      reset(s"$scratch/part_rc")
      Sources.writeRcText(Tables.t(s, dir, "part"), s"$scratch/part_rc")
      Sources.rcText(s, s"$scratch/part_rc", StructType(Seq(
          StructField("p_partkey", LongType),
          StructField("p_name", StringType),
          StructField("p_brand", StringType),
          StructField("p_type", StringType),
          StructField("p_size", IntegerType),
          StructField("p_retailprice", DoubleType))))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("p_size")).cast("long").as("size_sum"),
          call_function("dsum8", col("p_retailprice")).as("price_sum"))
        .orderBy(col("p_type").asc_nulls_last)
    })
}
