package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pin the `mm_resize_real` REP-TO-REP degradation mechanism (r17
  * verdict task 2; BASELINE r17 watch item): at sf10g the SAME query
  * read rep1→rep2 as 49.9→147.9 s (local[32]) and 89.9→213.4 s
  * (local[4]) — a ~3× per-session debt BOTH core counts pay on the
  * second identical pass. Candidates named in r17: the Java2D
  * Disposer thread draining Graphics2D native cleanups queued by
  * rep1; heap/codegen-cache growth. ImageIO's disk cache was already
  * ruled out.
  *
  * The probe isolates the pipeline STAGE carrying the debt by
  * running ONE variant per JVM (rep1 vs rep2 stays clean), reps
  * within the session, reporting wall + GC count/time deltas + the
  * Java2D Disposer thread's state after each rep:
  *
  *   - `decode`   ImageIO.read only, emit source dims — prices the
  *                PNG decoder alone;
  *   - `drawnoenc` decode + BufferedImage + createGraphics/drawImage,
  *                NO re-encode — adds the Graphics2D scale (the
  *                Disposer-relevant stage: every createGraphics
  *                queues a native cleanup);
  *   - `affnoenc` decode + AffineTransformOp (bilinear) into a
  *                pre-allocated raster, NO re-encode — the same
  *                scale WITHOUT Graphics2D, so no Disposer traffic;
  *   - `draw`     the shipped kernel verbatim (decode → draw → PNG
  *                encode → re-decode);
  *   - `drawgc`   `draw` + System.gc() + 5 s sleep between reps —
  *                if the debt is a drainable backlog (Disposer rides
  *                reference processing), the pause clears it.
  *
  * Read: if `draw` degrades but `affnoenc`/`decode` do not, the debt
  * lives in Graphics2D/Disposer; if `drawnoenc` is clean but `draw`
  * degrades, it is the PNG encoder; if EVERYTHING degrades, it is
  * session-global (heap/codegen). A consistency checksum (count +
  * dim sums) guards that all variants resize identically.
  *
  * usage: `ResizeRepProbe <sfDir> <variant> [reps]`
  */
object ResizeRepProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ResizeRepProbe <sfDir> <variant> [reps]")
    val dir = args(0)
    val variant = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import scala.jdk.CollectionConverters._

    val media = graft.operators.Multimodal.pngMediaFromDocuments(
      graft.sources.Tables.documents(spark, dir))
    println(s"[resizerep] variant=$variant media=${media.count()} " +
      s"heap=${Runtime.getRuntime.maxMemory() / (1 << 20)} MB cpus=$cpus")

    def gcTotals(): (Long, Long) = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
      .foldLeft((0L, 0L))((a, b) =>
        (a._1 + b.getCollectionCount, a._2 + b.getCollectionTime))

    def disposerState(): String = {
      val t = Thread.getAllStackTraces.asScala.keys
        .find(_.getName.contains("Java2D Disposer"))
      t.map(th => s"${th.getState}").getOrElse("ABSENT")
    }

    val (maxW, maxH) = (32, 32)
    // one mapPartitions kernel per variant — the draw arm is the
    // shipped Multimodal.resizeImages body verbatim
    def run(): (Long, Long, Long) = {
      val out = media.select(col("id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.grouped(64).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img = try {
              javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
            } catch { case _: Exception => null }
            if (img == null) (id, -1, -1)
            else {
              val s = math.min(1.0, math.min(
                maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
              val nw = math.max(1, math.floor(img.getWidth * s).toInt)
              val nh = math.max(1, math.floor(img.getHeight * s).toInt)
              variant match {
                case "decode" => (id, img.getWidth, img.getHeight)
                case "drawnoenc" =>
                  val scaled = new java.awt.image.BufferedImage(nw, nh,
                    java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
                  val g = scaled.createGraphics()
                  try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
                  (id, scaled.getWidth, scaled.getHeight)
                case "affnoenc" =>
                  val scaled = new java.awt.image.BufferedImage(nw, nh,
                    java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
                  val op = new java.awt.image.AffineTransformOp(
                    java.awt.geom.AffineTransform.getScaleInstance(
                      nw.toDouble / img.getWidth, nh.toDouble / img.getHeight),
                    java.awt.image.AffineTransformOp.TYPE_BILINEAR)
                  op.filter(img, scaled)
                  (id, scaled.getWidth, scaled.getHeight)
                case "draw" | "drawgc" =>
                  val scaled = new java.awt.image.BufferedImage(nw, nh,
                    java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
                  val g = scaled.createGraphics()
                  try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(scaled, "png", bos)
                  val back = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(bos.toByteArray))
                  (id, back.getWidth, back.getHeight)
              }
            }
          }
        })
      val r = out.toDF("id", "w", "h")
        .agg(count(lit(1)), sum(col("w")), sum(col("h"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    (1 to reps).foreach { rep =>
      val (c0, t0) = gcTotals()
      val w0 = System.nanoTime()
      val sig = run()
      val wall = (System.nanoTime() - w0) / 1e9
      val (c1, t1) = gcTotals()
      println(f"[resizerep] $variant rep$rep wall=$wall%.1f s " +
        f"gc=+${c1 - c0} (${t1 - t0} ms) disposer=${disposerState()} " +
        s"sig=$sig")
      if (variant == "drawgc" && rep < reps) {
        System.gc(); Thread.sleep(5000L)
      }
    }
    spark.stop()
  }
}
