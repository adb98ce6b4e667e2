package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (round 9 — VERDICT r8 task 8): measure the REAL-codec
  * multimodal kernel ([[graft.multimodal.Multimodal.decodeFeatures]]
  * over the javax.imageio path) at 1× and 10× so the partition-wise
  * codec plan has a scale number like every other kernel. Genuine PNGs
  * are ENCODED on the executors (deterministic per-pixel pattern from
  * committed integer hash arithmetic — no RNG, replayable), so the
  * probe measures the decode kernel against real codec work, not
  * in-memory stubs. Writes nothing; prints per-scale wall time.
  *
  * Measured shape to expect: decode cost is per-PIXEL (w·h·getRGB),
  * rows spread round-robin by Parallelism.ensure — linear in row count
  * at fixed image size, embarrassingly parallel, zero shuffles.
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = sys.env.getOrElse("SPARK_GRAFT_CODEC_ROWS", "5000").toInt
    def media(n: Int) =
      spark.range(n.toLong).select(col("id").as("media_id"))
        .repartition(32)
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            // 64x48 PNG, per-pixel gray from the committed multiplicative
            // hash of (id, x, y) — every image distinct, bit-replayable
            val img = new java.awt.image.BufferedImage(
              64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 48) {
              var x = 0
              while (x < 64) {
                val g = (((id * 2654435761L + x * 1013904223L + y * 97L)
                  % 256L + 256L) % 256L).toInt
                img.setRGB(x, y, (g << 16) | (g << 8) | g)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }.toDF("media_id", "payload")

    for (mult <- Seq(1, 10)) {
      val df = media(base * mult)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize: encode cost OUT of the timed window
      val t0 = System.nanoTime()
      val out = graft.multimodal.Multimodal.decodeFeatures(df)
      val n = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // sanity: real codec ran (all-gray images put every pixel of a row
      // in one luma bin — features non-degenerate, length 16)
      val probe = out.head()
      println(f"CODEC ${base * mult}%d pngs: $dt%.2f s ($n rows, " +
        f"feat len ${probe.features.length})")
      df.unpersist(true)
    }
    spark.stop()
  }
}
