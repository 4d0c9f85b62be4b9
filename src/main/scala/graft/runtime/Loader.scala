package graft.runtime

import graft.core.component._

/** Reflective component loading (reference: runtime/loader.py:15-137).
  *
  * `class_path` resolution order:
  *  1. a registered factory (explicit registry — the JVM-safe default);
  *  2. a Scala companion object implementing ComponentFactory
  *     (`Class.forName(path + "$")`);
  *  3. a class with a (Map[String,Any]) constructor;
  *  4. a class with a no-arg constructor (config ignored).
  *
  * Mirrors the reference's preference for `from_config(dict)` over
  * **kwargs construction (loader.py:78-86).
  */
object ComponentLoader {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ComponentFactory]()

  def register(path: String, factory: ComponentFactory): Unit =
    registry.put(path, factory)

  def register(path: String, factory: Map[String, Any] => PipelineComponent): Unit =
    registry.put(path, new ComponentFactory {
      def fromConfig(c: Map[String, Any]): PipelineComponent = factory(c)
    })

  def resolve(path: String): ComponentFactory = {
    val reg = registry.get(path)
    if (reg != null) return reg
    val companion =
      try {
        val cls = Class.forName(path + "$")
        cls.getField("MODULE$").get(null) match {
          case f: ComponentFactory => Some(f)
          case _ => None
        }
      } catch { case _: ReflectiveOperationException => None }
    companion.getOrElse {
      val cls =
        try Class.forName(path)
        catch {
          case e: ClassNotFoundException =>
            throw ComponentNotFoundError(s"class not found: $path (${e.getMessage})")
        }
      if (!classOf[PipelineComponent].isAssignableFrom(cls))
        throw ComponentInstantiationError(
          s"$path does not implement PipelineComponent")
      new ComponentFactory {
        def fromConfig(c: Map[String, Any]): PipelineComponent =
          try {
            val mapCtor = cls.getConstructors.find(
              k => k.getParameterCount == 1 &&
                k.getParameterTypes()(0).isAssignableFrom(classOf[Map[String, Any]]))
            mapCtor match {
              case Some(k) => k.newInstance(c).asInstanceOf[PipelineComponent]
              case None =>
                cls.getDeclaredConstructor().newInstance().asInstanceOf[PipelineComponent]
            }
          } catch {
            case e: ReflectiveOperationException =>
              throw ComponentInstantiationError(s"cannot instantiate $path", e)
          }
      }
    }
  }

  def load(path: String, config: Map[String, Any]): PipelineComponent = {
    val c = resolve(path).fromConfig(config)
    if (c == null)
      throw ComponentInstantiationError(s"factory for $path returned null")
    c
  }
}
