package graft.delta

import com.fasterxml.jackson.annotation.JsonInclude.Include
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** JSON (de)serialization for log actions.
  *
  * One JSON object per line in `_delta_log/N.json`, each an envelope with a
  * single field set (`{"add": {...}}`, `{"metaData": {...}}`, ...) — the
  * same wire format the reference writes (actions.scala:339-367 via
  * JsonUtils). `None` fields are omitted; unknown fields from other Delta
  * writers are ignored on read (forward compatibility).
  */
object JsonCodec {
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    // omit absent Option fields, but KEEP null map values — the protocol
    // serializes null partition values as JSON null
    m.setDefaultPropertyInclusion(
      com.fasterxml.jackson.annotation.JsonInclude.Value
        .construct(Include.NON_ABSENT, Include.ALWAYS))
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** `stats_parsed` is checkpoint-only (protocol purity) and must be
    * stripped HERE, at the serialization choke point: `@JsonIgnore` on a
    * Scala case-class constructor param is not reliably honored by
    * Jackson, and the one committer that carries a POPULATED struct at
    * commit time (DV shading re-adds state files) would otherwise leak
    * it into commit JSON. Worse, Jackson would read it back with
    * type-erased Integer boxes inside `Option[Long]` / `Map[String,
    * Long]`, which blows up Spark encoders arbitrarily later
    * (carry-over-fuzz-found). The read side normalizes too, in case a
    * historical or foreign line carries the field. */
  private def stripParsed(a: SingleAction): SingleAction =
    a.add.filter(_.stats_parsed.isDefined) match {
      case Some(add) => a.copy(add = Some(add.copy(stats_parsed = None)))
      case None => a
    }

  def toJson(a: SingleAction): String =
    mapper.writeValueAsString(stripParsed(a))
  def toJson(a: Action): String = toJson(a.wrap)

  def fromJson(line: String): SingleAction =
    stripParsed(mapper.readValue(line, classOf[SingleAction]))

  def actionFromJson(line: String): Action = fromJson(line).unwrap
}
