package graft

import graft.harness._
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's own unit tests (`tests/test_core.py:57-102`):
  * settings from JSON string / config file / env vars, and a concrete job
  * returning the expected closed response.
  */
class HarnessSpec extends AnyFunSuite {

  test("settings from CLI JSON string (E1, test_core.py:67-76)") {
    val s = JobSettings.fromJson(
      """{"input_source": "/in", "output_directory": "/out", "param": "3"}""")
    assert(s.inputSource == "/in")
    assert(s.outputDirectory == "/out")
    assert(s.extra == Map("param" -> "3"))
  }

  test("settings from config file (E2, test_core.py:78-86)") {
    val f = Files.createTempFile("settings", ".json")
    Files.writeString(f,
      """{"input_source": "/data/in", "output_directory": "/data/out"}""")
    val s = JobSettings.fromConfigFile(f.toString)
    assert(s == JobSettings("/data/in", "/data/out"))
  }

  test("settings from env vars (E3, test_core.py:88-93)") {
    val env = Map(
      "TRANSFORMATION_JOB_INPUT_SOURCE" -> "/e/in",
      "TRANSFORMATION_JOB_OUTPUT_DIRECTORY" -> "/e/out",
      "TRANSFORMATION_JOB_PARAM" -> "42",
      "UNRELATED" -> "x")
    val s = JobSettings.fromEnv(env)
    assert(s == JobSettings("/e/in", "/e/out", Map("param" -> "42")))
  }

  test("missing required settings fail validation") {
    intercept[IllegalArgumentException] {
      JobSettings.fromJson("""{"input_source": "/in"}""")
    }
    intercept[IllegalArgumentException] { JobSettings.fromEnv(Map.empty) }
  }

  test("non-scalar settings values fail validation (pydantic runtime parity)") {
    // required paths must be strings, not numbers/objects
    intercept[IllegalArgumentException] {
      JobSettings.fromJson(
        """{"input_source": 7, "output_directory": "/out"}""")
    }
    intercept[IllegalArgumentException] {
      JobSettings.fromJson(
        """{"input_source": "/in", "output_directory": {"path": "/out"}}""")
    }
    // extra keys are accepted only as scalars — containers are config errors
    intercept[IllegalArgumentException] {
      JobSettings.fromJson(
        """{"input_source": "/in", "output_directory": "/out",
          | "param": {"nested": 1}}""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      JobSettings.fromJson(
        """{"input_source": "/in", "output_directory": "/out",
          | "param": [1, 2]}""".stripMargin)
    }
    // scalar extras of any JSON type still normalize to strings
    val ok = JobSettings.fromJson(
      """{"input_source": "/in", "output_directory": "/out",
        | "n": 3, "flag": true}""".stripMargin)
    assert(ok.extra == Map("n" -> "3", "flag" -> "true"))
  }

  test("concrete job runs and returns the closed response (test_core.py:95-102)") {
    class ExampleJob(s: JobSettings) extends GenericEtl[JobSettings](s) {
      def runJob(spark: SparkSession): JobResponse =
        JobResponse(200, message = Some(s"read ${settings.inputSource}"))
    }
    val job = new ExampleJob(JobSettings("/in", "/out"))
    val r = job.runJob(null)
    assert(r == JobResponse(200, Some("read /in"), None))
  }
}
