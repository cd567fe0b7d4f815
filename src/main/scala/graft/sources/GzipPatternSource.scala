package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{Dataset, SparkSession}

/** Custom `gzip_pattern` dispatch — S10 (reference:
  * lib/logstash/inputs/s3.rb:89, 292-327; spec:452-477).
  *
  * The reference decides gzip-vs-plain per object by a CONFIGURABLE
  * regex over the key (default `\.gz(ip)?$`), tested with the
  * non-standard name `"gee.zip$"`. Hadoop's codec factory dispatches by
  * file extension only, so Spark's text source would read a gzip file
  * named `*.gee.zip` as raw bytes. This source reads files through the
  * `binaryFile` format (distributed: one row per file, scan-split by
  * `spark.sql.files.maxPartitionBytes` across files) and decompresses
  * exactly those whose path matches the pattern.
  *
  * Faithful reference semantics carried over:
  *  - Java GZIP reader handles CONCATENATED gzip members (the
  *    multiple_compressed_streams.gz fixture decodes to 16 events;
  *    s3.rb:309-323, CHANGELOG 3.1.2);
  *  - broken/corrupt files are skipped without crashing the job
  *    (s3.rb:292-301, CHANGELOG 3.3.5) — a file that fails to
  *    decompress yields zero rows;
  *  - invalid UTF-8 bytes decode to U+FFFD replacement chars
  *    (s3.rb:230-233, fixture invalid_utf8.gbk.log).
  *
  * Scale note: a whole object must fit in one task (the reference has
  * the identical constraint — it downloads whole objects); this is the
  * right shape for log-file-sized objects, not multi-GB archives.
  */
object GzipPatternSource {

  case class FileLine(path: String, line_no: Int, line: String)

  /** Default matches the reference's `gzip_pattern` default. */
  val defaultGzipPattern = "\\.gz(ip)?$"

  def readLines(spark: SparkSession, pathGlob: String,
      gzipPattern: String = defaultGzipPattern): Dataset[FileLine] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // pattern compiled once per task, like the reference compiling
        // config regexes at register time (s3.rb:99-128)
        val pat = java.util.regex.Pattern.compile(gzipPattern)
        it.flatMap { case (path, bytes) =>
          try {
            val raw: InputStream = new ByteArrayInputStream(bytes)
            val in =
              if (pat.matcher(path).find()) new GZIPInputStream(raw)
              else raw
            // InputStreamReader replaces malformed UTF-8 with U+FFFD by
            // default — the reference's charset sanitize (s3.rb:230-233)
            val reader = new java.io.BufferedReader(
              new java.io.InputStreamReader(in, "UTF-8"))
            val lines = Iterator.continually(reader.readLine())
              .takeWhile(_ != null).toVector
            lines.iterator.zipWithIndex.map { case (l, i) =>
              FileLine(path, i, l)
            }
          } catch {
            // broken file: skip, never crash (s3.rb:292-301)
            case _: java.io.IOException => Iterator.empty
          }
        }
      }
  }
}
