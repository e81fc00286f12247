package graft.harness

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's argparse surface
  * (`core.py:15-47`): settings come from `-j/--job-settings <json>`,
  * `-c/--config-file <path>`, or `TRANSFORMATION_JOB_*` env vars (in that
  * precedence order), plus `--job <FormatConversionJob|CompressionJob|DedupJob|QualityFilterJob|CompactionJob|ProfileJob|SampleJob|CdcApplyJob>`.
  *
  * Prints the JobResponse as one JSON line; exit code 0 iff statusCode 200.
  */
object JobRunner {

  def parseArgs(args: Array[String]): (String, JobSettings) = {
    var job = "FormatConversionJob"
    var settings: Option[JobSettings] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-j" | "--job-settings" =>
          settings = Some(JobSettings.fromJson(args(i + 1))); i += 2
        case "-c" | "--config-file" =>
          settings = Some(JobSettings.fromConfigFile(args(i + 1))); i += 2
        case "--job" => job = args(i + 1); i += 2
        case other =>
          throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    (job, settings.getOrElse(JobSettings.fromEnv()))
  }

  def makeJob(name: String, s: JobSettings): GenericEtl[JobSettings] =
    name match {
      case "FormatConversionJob" => new FormatConversionJob(s)
      case "CompressionJob" => new CompressionJob(s)
      case "DedupJob" => new DedupJob(s)
      case "QualityFilterJob" => new QualityFilterJob(s)
      case "CompactionJob" => new CompactionJob(s)
      case "ProfileJob" => new ProfileJob(s)
      case "SampleJob" => new SampleJob(s)
      case "CdcApplyJob" => new CdcApplyJob(s)
      case other =>
        throw new IllegalArgumentException(s"unknown job: $other")
    }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val (jobName, settings) = parseArgs(args)
    val spark = graft.Sessions.local(graft.Sessions.envCores,
      appName = "graft-job")
    val resp = makeJob(jobName, settings).runJob(spark)
    println(s"""{"status_code": ${resp.statusCode}""" +
      s""", "message": ${resp.message.map(q).getOrElse("null")}""" +
      s""", "data": ${resp.data.map(q).getOrElse("null")}}""")
    spark.stop()
    if (resp.statusCode != 200) sys.exit(1)
  }
}
