package graft.delta

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Hadoop Configuration is not java-serializable; this wrapper ships one
  * into task closures via its Writable form (the standard Spark-connector
  * pattern for executor-side FileSystem access). */
class SerializableHadoopConf(@transient private var _value: Configuration)
  extends Serializable {

  def value: Configuration = _value

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    _value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    _value = new Configuration(false)
    _value.readFields(in)
  }
}
