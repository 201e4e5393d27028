package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** `LOAD DATA INFILE` parity (SURVEY.md §3.2): the reference parses
  * delimited text with configurable delimiter/enclosure/terminator,
  * routes bad rows to a reject file (storage/tianmu/loader/
  * parsing_strategy.h:53-65, loader/rejecter.cpp), and builds 64K-row
  * column packs with per-pack metadata.
  *
  * Spark mapping: schema-d CSV read in PERMISSIVE mode with a corrupt-
  * record column (reject analog), then a Parquet write whose row groups
  * are the pack analog — with column statistics and optional bloom
  * filters standing in for the Knowledge Grid (DPN min/max +
  * RSIndex_Bloom, data/dpn.h:58, index/rsi_bloom.h).
  */
object CsvLoader {

  val CorruptCol = "_corrupt_record"

  case class LoadResult(clean: DataFrame, rejects: DataFrame)

  /** Parse a delimited file against `schema`; rows that fail to parse come
    * back separately (the reject file analog). TPC-H-style trailing
    * delimiters are tolerated via an ignored trailing column when
    * `trailingDelimiter`.
    *
    * Date/timestamp columns follow MySQL's loose-mode LOAD DATA contract
    * (SURVEY §1.2, FIXTURES.md): the zero date `0000-00-00` (and zero
    * timestamp) is a legal FIELD value that becomes NULL — it must not
    * reject the whole row the way a structural defect (bad numeric,
    * wrong column count) does. Those columns are therefore parsed as
    * strings and cast value-level after the row-level reject split; an
    * unparseable date likewise degrades to NULL (MySQL converts it to
    * the zero date with a warning rather than failing the load). */
  def load(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ",", quote: String = "\"",
           trailingDelimiter: Boolean = false,
           nullValue: String = "\\N",
           escape: String = "\\",
           skipLines: Int = 0,
           lineSep: Option[String] = None,
           looseNumerics: Boolean = false,
           nullWord: Boolean = false): LoadResult = {
    import org.apache.spark.sql.types.{DateType, TimestampType, TimestampNTZType}
    def isTemporal(f: org.apache.spark.sql.types.StructField) =
      f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType
    def isNum(f: org.apache.spark.sql.types.StructField) =
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    // looseNumerics (the statement tier's LOAD DATA): MySQL never
    // rejects a row for an unparseable numeric FIELD — it prefix-parses
    // ('null' → 0 into a BIGINT, warning 1366; issue1153). Parse those
    // columns as strings and cast value-level after the reject split.
    val parseSchema = StructType(schema.fields.map(f =>
      if (isTemporal(f) || (looseNumerics && isNum(f))) f.copy(dataType =
        org.apache.spark.sql.types.StringType)
      else f))
    val readSchema0 =
      if (trailingDelimiter) parseSchema.add("_trailing", "string")
      else parseSchema
    val readSchema = readSchema0.add(CorruptCol, "string")
    val reader = spark.read
      .schema(readSchema)
      .option("delimiter", delimiter)
      .option("quote", quote)
      // MySQL LOAD DATA ESCAPED BY (loader/parsing_strategy.h:53-65)
      .option("escape", escape)
      // MySQL LOAD DATA spells NULL as \N (sql/sql_load semantics)
      .option("nullValue", nullValue)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    // custom record terminator (LINES TERMINATED BY ';', issue1209):
    // Spark CSV accepts a 1-character lineSep; \n and \r\n stay on
    // auto-detect (the reader handles both without the option)
    lineSep.foreach(ls => reader.option("lineSep", ls))
    val raw = (if (skipLines <= 0) reader.csv(path)
      else reader.csv(skipLeadingLines(spark, path, skipLines)))
      .cache() // one pass parses; clean/reject split reuses it
    // with a non-empty ENCLOSED BY, the UNENCLOSED word NULL reads as
    // SQL NULL (MySQL sql_load semantics — issue1153's second block);
    // the empty-enclosure form keeps it a plain string
    def nullWorded(c: org.apache.spark.sql.Column) =
      if (nullWord) when(upper(c) === lit("NULL"), lit(null)).otherwise(c)
      else c
    val clean = raw.filter(col(CorruptCol).isNull)
      .select(schema.fields.map { f =>
        if (isTemporal(f))
          // zero date/timestamp → NULL, then loose (ANSI-off) cast
          nullif(nullif(nullWorded(col(f.name)), lit("0000-00-00")),
            lit("0000-00-00 00:00:00"))
            .cast(f.dataType).as(f.name)
        else if (looseNumerics && isNum(f)) {
          val s = nullWorded(col(f.name))
          val prefix = regexp_extract(s,
            "^\\s*([+-]?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)", 1)
          when(s.isNull, lit(null))
            .otherwise(coalesce(prefix.cast(f.dataType), lit(0)
              .cast(f.dataType))).as(f.name)
        }
        else nullWorded(col(f.name)).as(f.name)
      }.toSeq: _*)
    val rejects = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    LoadResult(clean, rejects)
  }

  /** `IGNORE n LINES`: drop the first n lines of the (single) input
    * file. The driver reads only those n lines to learn the byte offset
    * where kept data starts; the bulk read is then a distributed
    * Hadoop text scan filtered on each line's start offset — no
    * driver-side materialization of the data itself, so an arbitrarily
    * large file skips its header at scan parallelism. */
  private def skipLeadingLines(spark: SparkSession, path: String,
                               n: Int): org.apache.spark.sql.Dataset[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(fs.getFileStatus(p).getPath)
    var cutoff = 0L
    try {
      var lines = 0
      var b = in.read()
      while (lines < n && b >= 0) {
        cutoff += 1
        if (b == '\n') lines += 1
        b = if (lines < n) in.read() else -1
      }
    } finally in.close()
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
      classOf[org.apache.hadoop.io.LongWritable],
      classOf[org.apache.hadoop.io.Text], conf)
      .filter(_._1.get() >= cutoff).map(_._2.toString)
    spark.createDataset(rdd)(org.apache.spark.sql.Encoders.STRING)
  }

  /** `SELECT … INTO OUTFILE` parity (core/engine.h:338
    * `ResultExportSender`, exporter/export2file.cpp,
    * exporter/data_exporter_txt.cpp): export a result as delimited text
    * with configurable delimiter/enclosure/line terminator. Distributed
    * write — one file per partition, exactly how the export scales past
    * one node (the reference streams through a single connection). */
  def export(df: DataFrame, outPath: String, delimiter: String = ",",
             quote: String = "\"", lineSep: String = "\n",
             header: Boolean = false, escape: String = "\\"): Unit =
    df.write.mode("overwrite")
      .option("delimiter", delimiter)
      .option("quote", quote)
      .option("escape", escape)
      .option("lineSep", lineSep)
      .option("header", header)
      .csv(outPath)

  /** Write with pack-analog tuning: bounded row groups (the 64K-row pack,
    * common/defs.h:47), stats always on, bloom filters for the named
    * columns (RSIndex_Bloom analog — consulted by Parquet readers for
    * point predicates the way the reference consults KN nodes). */
  def writePacked(df: DataFrame, outPath: String,
                  bloomCols: Seq[String] = Nil,
                  rowGroupBytes: Long = 32L << 20): Unit = {
    var w = df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
    bloomCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    w.parquet(outPath)
  }
}
