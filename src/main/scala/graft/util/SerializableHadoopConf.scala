package graft.util

import org.apache.hadoop.conf.Configuration

/** Java-serializable Hadoop Configuration carrier. Executors receive
  * task closures / reader factories by serialization and
  * `Configuration` itself is not Serializable, so every executor-side
  * FileSystem consumer (per-sample sinks, stats sidecars, webdataset
  * reader) ships the DRIVER's session conf through this wrapper — a
  * bare `new Configuration()` on the executor would drop every
  * `spark.hadoop.*` setting (object-store credentials, fs.defaultFS)
  * and silently consult the wrong filesystem.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
