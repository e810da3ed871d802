package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** The reference's single checkpoint document, stored in SSM Parameter
  * Store as a JSON SecureString (reference: README.md:32-45 seed shape;
  * read src/db_extractor_full.py:429-436; write :540-551):
  *
  * {"data":{"lastRunTime":"...","serialNumber":N},
  *  "schema":{"serialNumber":N,"lastMD5Hash":"..."}}
  */
final case class CheckpointState(
    lastRunTime: String,
    dataSerial: Long,
    schemaSerial: Long,
    lastMD5Hash: String) {

  def toJson: String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val data = root.putObject("data")
    data.put("lastRunTime", lastRunTime)
    data.put("serialNumber", dataSerial)
    val sch = root.putObject("schema")
    sch.put("serialNumber", schemaSerial)
    sch.put("lastMD5Hash", lastMD5Hash)
    m.writeValueAsString(root)
  }
}

object CheckpointState {
  def fromJson(s: String): CheckpointState = {
    val n = new ObjectMapper().readTree(s)
    CheckpointState(
      lastRunTime = n.path("data").path("lastRunTime").asText(""),
      dataSerial = n.path("data").path("serialNumber").asLong(0L),
      schemaSerial = n.path("schema").path("serialNumber").asLong(0L),
      lastMD5Hash = n.path("schema").path("lastMD5Hash").asText(""))
  }

  /** Fresh seed — serials at 0, epoch watermark (everything exports). */
  val seed: CheckpointState =
    CheckpointState("1970-01-01 00:00:00", 0L, 0L, "")
}

/** Driver-side state store behind a trait: file-backed for tests/local,
  * an SSM `get_parameter`/`put_parameter` implementation plugs in for
  * AWS (kept out of this build: no SDK in the offline environment).
  */
trait CheckpointStore {
  def read(): CheckpointState
  def write(st: CheckpointState): Unit
}

final class FileCheckpointStore(path: Path) extends CheckpointStore {
  override def read(): CheckpointState =
    if (Files.exists(path)) CheckpointState.fromJson(Files.readString(path))
    else CheckpointState.seed

  override def write(st: CheckpointState): Unit = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.writeString(path, st.toJson,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}

object FileCheckpointStore {
  def apply(p: String): FileCheckpointStore =
    new FileCheckpointStore(Paths.get(p))
}

/** SSM Parameter Store checkpoint — the reference's actual store
  * (get_parameter with decryption, db_extractor_full.py:429-436;
  * put_parameter as SecureString overwrite, :540-551). The AWS SDK is
  * unavailable in this offline build, so the two SSM calls are
  * INJECTED: a deployment passes closures over its SDK client
  * (`GetParameter(WithDecryption=true)` / `PutParameter(Type=
  * SecureString, Overwrite=true)`); tests pass an in-memory map. All
  * checkpoint semantics (seed on absence, JSON document shape, gated
  * advance) live in this class and Exporter, not in the transport.
  */
final class SsmCheckpointStore(
    parameterName: String,
    getParameter: String => Option[String],
    putParameter: (String, String) => Unit) extends CheckpointStore {

  override def read(): CheckpointState =
    getParameter(parameterName)
      .map(CheckpointState.fromJson)
      .getOrElse(CheckpointState.seed)

  override def write(st: CheckpointState): Unit =
    putParameter(parameterName, st.toJson)
}
