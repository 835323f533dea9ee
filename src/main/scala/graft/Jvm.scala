package graft

/** Guest-VM guardrails shared by the driver-contract mains. */
object Jvm {

  /** The round-1 driver executed Bench with an ~89 GiB heap (its
    * BlockManager registered 53.2 GiB of storage) and recorded scaling
    * efficiency 0.610: on this guest a multi-ten-GiB heap puts the
    * kernel 30-70% of CPU into page-fault handling (sy >> us) and every
    * build runs ~3x slower. Capping spark.memory.fraction is NOT enough
    * — G1 still expands the heap toward -Xmx (measured: 43 GiB RSS under
    * -Xmx64g with the fraction clamp in place). The only robust control
    * is the heap size itself, so a main launched with an oversized heap
    * RE-EXECS into a child JVM with the tuned -Xmx8g (same classpath,
    * same module opens, stdio inherited — the caller reads the same
    * stdout). Opt out with SPARK_GRAFT_NO_REEXEC=1. */
  /** JVM unified-logging WARNINGS print to stdout by default — under
    * memory pressure (e.g. "[gc,alloc] Retried waiting for GCLocker"
    * during a big parquet decode) they interleave with, and corrupt,
    * the driver-contract one-JSON-line stdout of [[Bench]]. Re-route
    * the default logging sink to stderr at runtime via the jcmd
    * VM.log diagnostic command (first drop every configured output,
    * then re-add warnings on stderr). Best-effort: a JVM without the
    * DiagnosticCommand MBean just keeps the default. */
  def routeJvmLogToStderr(): Unit = try {
    val server = java.lang.management.ManagementFactory.getPlatformMBeanServer
    val name =
      new javax.management.ObjectName("com.sun.management:type=DiagnosticCommand")
    def vmLog(args: String*): Unit =
      server.invoke(name, "vmLog",
        Array[AnyRef](args.toArray),
        Array("[Ljava.lang.String;"))
    vmLog("disable")
    vmLog("output=stderr", "what=all=warning")
  } catch { case _: Throwable => () }

  def reexecIfOversizedHeap(mainClass: String, args: Array[String]): Unit = {
    val cap = 12L << 30
    if (Runtime.getRuntime.maxMemory() <= cap ||
      sys.env.contains("SPARK_GRAFT_NO_REEXEC")) return
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms") ||
        a.startsWith("-XX:MaxRAMPercentage") ||
        a.startsWith("-XX:InitialRAMPercentage"))
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx8g",
      "-cp", System.getProperty("java.class.path"), mainClass) ++ args
    System.err.println(s"[graft] heap ${Runtime.getRuntime.maxMemory() >> 20}" +
      s" MiB oversized for this guest; re-exec $mainClass with -Xmx8g")
    val pb = new ProcessBuilder(cmd: _*).inheritIO()
    pb.environment().put("SPARK_GRAFT_NO_REEXEC", "1")
    sys.exit(pb.start().waitFor())
  }
}
