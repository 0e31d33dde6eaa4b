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

  def toJson(a: SingleAction): String = mapper.writeValueAsString(a)
  def toJson(a: Action): String = toJson(a.wrap)

  def fromJson(line: String): SingleAction =
    mapper.readValue(line, classOf[SingleAction])

  def actionFromJson(line: String): Action = fromJson(line).unwrap
}
