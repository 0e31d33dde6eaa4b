package graft.tools

/** Classpath fingerprint for artifact self-reporting (VERDICT r14 #3).
  *
  * The r14 sf0.1 oracle gate lost `delta_copy_into` to a mid-run
  * `target/` recompile: the forked JVM loaded half-recompiled classes and
  * the failure read as a correctness regression until adjudicated. The
  * fix is mechanical, not disciplinary — Verify and Bench stamp a
  * fingerprint of the classes directory they loaded from at START and
  * END; a mismatch marks the artifact `class_skew: true` and exits
  * non-zero, so a skewed artifact can never masquerade as a clean one.
  *
  * The fingerprint is (class-file count, total bytes, max mtime) over the
  * code-source directory — cheap (one directory walk, no hashing of
  * contents) and it changes on ANY recompile because sbt/zinc rewrites
  * the touched .class files with fresh mtimes.
  */
object ClassFingerprint {
  /** Fingerprint of the directory this class was loaded from, or a
    * stable token when the code source is a jar / unavailable (a jar
    * cannot skew mid-run: the JVM holds it open). */
  def current(): String = {
    try {
      val src = getClass.getProtectionDomain.getCodeSource
      if (src == null || src.getLocation == null) return "no-code-source"
      val root = java.nio.file.Paths.get(src.getLocation.toURI)
      if (!java.nio.file.Files.isDirectory(root)) {
        val sz = java.nio.file.Files.size(root)
        val mt = java.nio.file.Files.getLastModifiedTime(root).toMillis
        return s"jar:$sz:$mt"
      }
      var count = 0L
      var bytes = 0L
      var maxMtime = 0L
      val stream = java.nio.file.Files.walk(root)
      try {
        stream.forEach { p =>
          if (p.toString.endsWith(".class")) {
            count += 1
            bytes += java.nio.file.Files.size(p)
            val mt = java.nio.file.Files.getLastModifiedTime(p).toMillis
            if (mt > maxMtime) maxMtime = mt
          }
        }
      } finally stream.close()
      s"dir:$count:$bytes:$maxMtime"
    } catch {
      case scala.util.control.NonFatal(t) => s"error:${t.getClass.getName}"
    }
  }
}
