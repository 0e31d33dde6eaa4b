package graft.delta

import org.apache.spark.sql.{Encoder, Encoders}

/** JVM-cached encoders for the hot replay/checkpoint row types.
  *
  * `Encoders.product[T]` derives the encoder through runtime reflection
  * (ScalaReflection) on EVERY call — profiled at 100-200 ms per Delta
  * lifecycle query across the checkpoint-write / state-read sites (guide
  * §1: measure first; the samples showed `ScalaReflection.isSubtype` and
  * `encoderFor` recurring on the driver between jobs). Encoders are
  * immutable descriptors that every Dataset resolves-and-binds its own
  * copy of, so deriving each ONCE per JVM is semantics-free.
  */
private[delta] object Encs {
  lazy val addFile: Encoder[AddFile] = Encoders.product[AddFile]
  lazy val singleAction: Encoder[SingleAction] = Encoders.product[SingleAction]
  lazy val lightAction: Encoder[Snapshot.LightAction] =
    Encoders.product[Snapshot.LightAction]
  lazy val stateAction: Encoder[Snapshot.StateAction] =
    Encoders.product[Snapshot.StateAction]
  lazy val v2StateAction: Encoder[V2Checkpoints.V2StateAction] =
    Encoders.product[V2Checkpoints.V2StateAction]
  lazy val v2MainAction: Encoder[Checkpoints.V2MainAction] =
    Encoders.product[Checkpoints.V2MainAction]
  lazy val snapshotIndexedFile: Encoder[streaming.SnapshotIndexedFile] =
    Encoders.product[streaming.SnapshotIndexedFile]
  lazy val dvDescriptor: Encoder[DeletionVectorDescriptor] =
    Encoders.product[DeletionVectorDescriptor]
}
