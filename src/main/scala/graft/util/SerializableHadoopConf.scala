package graft.util

import org.apache.hadoop.conf.Configuration

/** A serializable carrier for a Hadoop `Configuration`, so DRIVER-side
  * session config (filesystem impls, credentials — `spark.sessionState
  * .newHadoopConf()`) reaches EXECUTOR-side `FileSystem` resolution.
  *
  * Why it exists: `Configuration` itself is not `java.io.Serializable`,
  * and building `new Configuration()` inside a task (the pattern this
  * replaces, round-13 advice on graft's Avro IO) resolves only
  * classpath-default filesystems — a remote scheme whose impl or
  * credentials live in the session conf would hit the wrong or
  * unconfigured FS on the executor while the driver half worked. Same
  * shape as Spark's own internal wrapper (`org.apache.spark.util
  * .SerializableConfiguration`, which is `private[spark]` and therefore
  * re-expressed rather than imported): Hadoop's native
  * `write`/`readFields` wire format inside Java serialization hooks.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
