package graft.connect

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S8/S9/S10 — the extract-prep-load tail of the pipeline
  * (dags/dreem.py:153-251): per-group download of raw files, zip bundling,
  * checksummed upload, local cleanup, with per-group isolation (one failing
  * group logs and continues; state only advances on success).
  *
  * Executor-parallel: the upload plan is a DataFrame of groups; the
  * transfer runs in `mapPartitions` (one task per partition, groups
  * streamed), so 1000 executors drain 1000 groups at a time. The fetch and
  * push sides are injected functions, keeping the operator testable offline
  * and the HTTP/cloud specifics pluggable — the reference's equivalent
  * seams are DreemHook.download_file and DmpHook.upload.
  */
object FileTransfer {

  /** One file to land: (ref, target name). `fetch` returns false when the
    * file is not yet available upstream (drm.py:62-66) — the group is then
    * skipped this run and retried next run, state unadvanced.
    */
  final case class GroupResult(dmp_id: String, n_files: Int, zipped: Boolean,
                               uploaded: Boolean, error: String)

  def sha256File(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = new BufferedInputStream(new FileInputStream(p.toFile))
    try {
      val buf = new Array[Byte](8192) // reference upload block size, dmp.py:108
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest.map("%02x".format(_)).mkString
  }

  /** shutil.make_archive equivalent (dmp.py:172-177). */
  def zipFolder(folder: Path): Path = {
    val zipPath = Paths.get(folder.toString + ".zip")
    val out = new ZipOutputStream(new BufferedOutputStream(
      new FileOutputStream(zipPath.toFile)))
    try {
      val listing = Files.list(folder) // close the dir stream: executors
      try listing.sorted().forEach { f => // loop over many groups per task
        out.putNextEntry(new ZipEntry(f.getFileName.toString))
        Files.copy(f, out)
        out.closeEntry()
      } finally listing.close()
    } finally out.close()
    zipPath
  }

  def rmTree(p: Path): Unit = {
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** S2 default fetch implementation — the reference's two-step download
    * (ideafast_etl/hooks/drm.py:48-90): query the record endpoint for the
    * file's location; a missing/empty `data_url` means the file is not
    * ready upstream (still on-device or mid-processing, drm.py:62-66) →
    * false, group retried next run. Otherwise stream the payload to disk
    * in chunks (reference uses 1 KiB iter_content) and return true.
    *
    * `recordUrl` builds the metadata URL from the ref (the reference's
    * `base_url + "dreem/algorythm/record/<ref>/h5/"`, drm.py:56).
    */
  def chunkedFetch(transport: Transport, tokens: TokenProvider,
                   recordUrl: String => String,
                   log: String => Unit = _ => ())(
                   ref: String, target: Path): Boolean = {
    val meta = transport.send(HttpRequest("GET", recordUrl(ref),
      tokens.authHeader()))
    require(meta.isSuccess, s"record query failed: HTTP ${meta.status}")
    Jwt.dotPath(meta.bodyString, "data_url").filter(_.nonEmpty) match {
      case None => false // not ready upstream: no data_url yet
      case Some(fileUrl) =>
        // file_url embeds its own auth (drm.py:52-53) — no headers.
        // Streaming body: socket → disk in 1 KiB chunks (drm.py:70-88's
        // iter_content loop), constant memory regardless of file size —
        // the download-side twin of Dmp.multipartStream's upload posture.
        val resp = transport.sendStreaming(HttpRequest("GET", fileUrl))
        try { // body closed on EVERY exit — incl. setup throws below
          if (!resp.isSuccess)
            throw new IllegalStateException(s"file download failed: HTTP ${resp.status}")
          val total = resp.contentLength // -1 when absent or unusable
          val out = new BufferedOutputStream(new FileOutputStream(target.toFile))
          try {
            val buf = new Array[Byte](1024)
            var got = 0L
            var percentDown = 0
            var n = resp.body.read(buf)
            while (n >= 0) {
              if (n > 0) {
                out.write(buf, 0, n)
                got += n
                if (total > 0) {
                  // 10%-step progress (drm.py:80-86)
                  val status = (got * 100 / total).toInt
                  if (status > percentDown + 10) {
                    percentDown = status / 10 * 10
                    log(s"$percentDown% Downloaded")
                  }
                }
              }
              n = resp.body.read(buf)
            }
            // a dropped connection can surface as clean EOF, not an
            // exception — never accept a short body as a good download
            if (total > 0 && got != total)
              throw new java.io.IOException(
                s"truncated download: got $got of $total bytes")
            log("100% Downloaded")
          } finally out.close()
        } finally resp.body.close()
        true
    }
  }

  /** Execute an upload plan: for every (dmp_id, member_refs) group —
  *  download members → zip → upload → cleanup; any failure inside a group
  *  marks only that group failed (per-group try/except, dags/dreem.py:219-228)
  *  and cleanup always runs (the ALL_DONE trigger rule, dags/dreem.py:236-251).
  *
  * Returns one row per group; the caller advances `is_uploaded` in the
  * ledger ONLY for rows with uploaded=true (at-least-once + idempotent
  * redelivery).
  */
  def executePlan(spark: SparkSession, plan: DataFrame, workDir: String,
                  fetch: (String, Path) => Boolean,
                  push: (String, Path) => Boolean): DataFrame = {
    import spark.implicits._
    val groups = plan.select(col("dmp_id"), col("member_refs"))
      .as[(String, Seq[String])]
    groups.mapPartitions { it =>
      it.map { case (dmpId, refs) =>
        val folder = Paths.get(workDir, dmpId)
        var zipped = false
        try {
          // refs come from ledger data: reject anything that could resolve
          // outside the per-group work folder (path separators, '..') or
          // break zipFolder's flat listing
          val badRef = refs.find(r => !r.matches("[A-Za-z0-9._-]+") || r.contains(".."))
          badRef.foreach(r => throw new IllegalArgumentException(
            s"unsafe member_ref rejected: '$r'"))
          Files.createDirectories(folder)
          val all = refs.forall { ref =>
            fetch(ref, folder.resolve(s"$ref.h5"))
          }
          if (!all) GroupResult(dmpId, refs.size, zipped = false,
            uploaded = false, error = "file not ready upstream")
          else {
            val zip = zipFolder(folder)
            zipped = true
            try {
              val ok = push(dmpId, zip)
              GroupResult(dmpId, refs.size, zipped, uploaded = ok,
                error = if (ok) "" else "upload failed")
            } finally Files.deleteIfExists(zip)
          }
        } catch {
          case e: Exception =>
            GroupResult(dmpId, refs.size, zipped, uploaded = false,
              error = String.valueOf(e.getMessage))
        } finally rmTree(folder)
      }
    }.toDF()
  }
}
