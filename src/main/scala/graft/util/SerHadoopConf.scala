package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for a Hadoop [[Configuration]] — the session's
  * resolved conf (spark.hadoop.*, programmatic credentials,
  * fs.defaultFS) shipped to executor-side code that opens filesystems
  * OUTSIDE a Hadoop InputFormat/OutputFormat (point readers, custom
  * sinks). A bare executor-side `new Configuration()` sees only
  * classpath defaults and silently drops every runtime setting.
  * (Spark's own SerializableConfiguration is private[spark].)
  */
final class SerHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  def value: Configuration = conf

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
