package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration` (which is
  * `Writable` but not `Serializable`). The driver's session conf is
  * captured at planning time and shipped to executors inside the
  * `PartitionReaderFactory`, so session-configured filesystem options
  * (s3a credentials, `fs.defaultFS` overrides) reach the readers —
  * opening files with `new Configuration()` on the executor would
  * silently drop them.
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
