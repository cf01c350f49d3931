package graft.flow

import java.nio.file.Files

import graft.SparkSpec
import graft.xes.XesParser

/** End-to-end flow execution mirroring the reference's doc-test
  * pipeline (`/root/reference/src/stream/flow/mod.rs:3-64`):
  * read bigger-example → repair → validate → stats → sample(0.1) →
  * stats → split(0.8, test branch to second pipe) → stats; second pipe
  * receives the test stream, takes stats, writes XES.
  *
  * Exact sampled memberships are engine-specific (SURVEY.md §7.4.5);
  * the portable contracts are the raw counts, ratio convergence,
  * train+test=sample, and the written files re-parsing.
  */
class FlowRunnerSpec extends SparkSpec {

  def spec(tmp: String): String =
    s"""{
       |  "pipes": [
       |    {
       |      "name": "Train",
       |      "source": {"name": "XesReader", "attributes":
       |        {"path": {"String": "/root/reference/static/xes/book/bigger-example.xes"}}},
       |      "streams": [
       |        {"name": "Repair"},
       |        {"name": "Validator"},
       |        {"name": "Statistics", "artifact_sender": ["raw_stats"]},
       |        {"name": "Sample", "attributes": {"ratio": {"Float": 0.1}, "seed": {"Int": 0}}},
       |        {"name": "Statistics", "artifact_sender": ["sample_stats"]},
       |        {"name": "Split", "attributes": {"ratio": {"Float": 0.8}, "seed": {"Int": 0}},
       |         "stream_sender": ["test"]},
       |        {"name": "Statistics", "artifact_sender": ["train_stats"]}
       |      ],
       |      "sink": {"name": "XesWriter", "attributes": {"path": {"String": "$tmp/train.xes"}}}
       |    },
       |    {
       |      "name": "Test",
       |      "source": {"name": "Receiver", "stream_receiver": ["test"]},
       |      "streams": [{"name": "Statistics", "artifact_sender": ["test_stats"]}],
       |      "sink": {"name": "XesWriter", "attributes": {"path": {"String": "$tmp/test.xes"}}}
       |    }
       |  ]
       |}""".stripMargin

  test("reference flow.json pipeline runs end-to-end with consistent stats") {
    val tmp = Files.createTempDirectory("flow").toString
    val result = FlowRunner.runJson(spark, spec(tmp))

    val raw = result.artifacts("raw_stats").asInstanceOf[FlowRunner.Statistics]
    assert(raw.counts == Seq(1391L, 7539L, 7539L)) // flow/mod.rs:51-55

    val sample = result.artifacts("sample_stats").asInstanceOf[FlowRunner.Statistics]
    val train = result.artifacts("train_stats").asInstanceOf[FlowRunner.Statistics]
    val test = result.artifacts("test_stats").asInstanceOf[FlowRunner.Statistics]

    // ratio convergence, not exact membership (split.rs:161-224)
    assert(math.abs(sample.nTraces / 1391.0 - 0.1) < 0.03, s"sample=${sample.counts}")
    assert(train.nTraces + test.nTraces == sample.nTraces)
    assert(train.nEventsTotal + test.nEventsTotal == sample.nEventsTotal)
    assert(math.abs(train.nTraces.toDouble / sample.nTraces - 0.8) < 0.05,
      s"train=${train.counts} sample=${sample.counts}")

    // written logs re-parse with the split counts
    val trainLog = XesParser.parse("train.xes",
      Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/train.xes")))
    assert(trainLog.counts == train.counts)
    val testLog = XesParser.parse("test.xes",
      Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/test.xes")))
    assert(testLog.counts == test.counts)
  }

  test("flow deadlock is detected (graph.rs:149-152)") {
    val bad =
      """{"pipes": [{"name": "P", "source": {"name": "Receiver",
        |  "stream_receiver": ["never"]}, "streams": []}]}""".stripMargin
    assertThrows[IllegalStateException](FlowRunner.runJson(spark, bad))
  }
}
